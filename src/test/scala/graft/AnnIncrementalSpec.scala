package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns.hash60

/** Proves `ann_ivf_incremental`'s production contract: the stored side
  * of the index (cell assignments + codebook) survives a parquet
  * round-trip bit-exactly, so an ingest job that READS the persisted
  * index and attaches only the increment produces row-identical output
  * to the in-query catalog op — the ANN analogue of
  * IncrementalDedupSpec's signature-store proof.
  */
class AnnIncrementalSpec extends SparkSpecBase {

  test("attach from a parquet round-tripped index equals the in-query op") {
    import spark.implicits._
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
      .withColumn("is_new",
        hash60(concat(lit("ing:"), $"vec_id")) % 10 === 0)
    val existing = e.filter(!$"is_new")
    // same √N nlist policy as the catalog op
    val cells = math.max(16,
      math.floor(math.sqrt(existing.count().toDouble)).toInt)
    val cents = existing.orderBy($"vec_id".asc).limit(cells)
      .select($"vec_id".as("cell"), $"ne".as("cv"))
    val stored = ops.Similarity.assignCells(
        existing.select($"vec_id", $"ne"), cents)
      .select($"vec_id".as("cand_id"), $"ne".as("nc"), $"cell")

    val dir = java.nio.file.Files.createTempDirectory("ivfstore").toString
    stored.write.mode("overwrite").parquet(s"$dir/lists")
    cents.write.mode("overwrite").parquet(s"$dir/codebook")

    val fromStore = ops.Similarity.ivfAttachIncrement(spark,
      e.filter($"is_new").select($"vec_id", $"ne"),
      spark.read.parquet(s"$dir/lists"),
      spark.read.parquet(s"$dir/codebook"))
    val inQuery = SparkEntry.queries("ann_ivf_incremental")(spark, sf)
    assert(fromStore.count() === inQuery.count())
    assert(fromStore.exceptAll(inQuery).isEmpty &&
      inQuery.exceptAll(fromStore).isEmpty)
  }

  test("every increment row attaches to a cell the codebook names") {
    import spark.implicits._
    val rep = SparkEntry.queries("ann_ivf_incremental")(spark, sf).cache()
    // increment ids and index ids are disjoint by the hash split
    assert(rep.filter($"inc_id" === $"cand_id").count() === 0)
    // ranks are 1..k per inc_id with k ≤ 3
    val bad = rep.groupBy($"inc_id")
      .agg(count(lit(1)).as("k"), max($"rank").as("mx"), min($"rank").as("mn"))
      .filter($"mn" =!= 1 || $"mx" =!= $"k" || $"k" > 3)
    assert(bad.count() === 0)
    rep.unpersist()
  }
}
