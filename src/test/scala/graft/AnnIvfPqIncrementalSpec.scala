package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns.hash60

/** Proves `ann_ivfpq_incremental`'s production contract: the ENTIRE
  * stored side of the coded index — coarse centroids, per-subspace PQ
  * codebooks, and the 8-byte code lists (no raw vectors) — survives a
  * parquet round-trip such that an ingest job that READS the persisted
  * index and attaches only the increment produces row-identical output
  * to the in-query catalog op. The coded sibling of AnnIncrementalSpec;
  * together with it, the store convention covers both the raw-list and
  * the compressed-list index layouts.
  */
class AnnIvfPqIncrementalSpec extends SparkSpecBase {

  test("attach from a parquet round-tripped coded index equals the in-query op") {
    import spark.implicits._
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
      .withColumn("is_new",
        hash60(concat(lit("ing:"), $"vec_id")) % 10 === 0)
    val existing = e.filter(!$"is_new").select($"vec_id", $"ne")
    // same √N nlist policy as the catalog op
    val cells = math.max(16,
      math.floor(math.sqrt(existing.count().toDouble)).toInt)
    val cents = existing.orderBy($"vec_id".asc).limit(cells)
      .select($"vec_id".as("cell"), $"ne".as("cv"))
    val esub = ops.Similarity.assignCells(existing, cents)
      .select(col("vec_id"), col("cell"),
        explode(expr("sequence(0, 7)")).as("m"), col("ne"))
      .select(col("vec_id"), col("cell"), col("m"),
        expr("slice(ne, m * 8 + 1, 8)").as("sv"))
    val slotted = ops.Similarity.pqSlotted(
      ops.Similarity.pqCodebooks(spark, esub.select($"vec_id", $"m", $"sv"))
        .withColumn("cvv", expr("vec_dot(cv, cv)")))
    val stored = esub
      .join(broadcast(ops.Similarity.pqSlotPack(slotted)), "m")
      .select($"vec_id", $"cell",
        $"m", expr("pq_argmin(sv, flat, cvvs, sids)").as("slot"))
      .groupBy($"vec_id", $"cell")
      .agg(expr("transform(array_sort(collect_list(struct(m, slot))), x -> x.slot)")
        .as("codes"))
      .select($"vec_id".as("cand_id"), $"cell", $"codes")

    val dir = java.nio.file.Files.createTempDirectory("ivfpqstore").toString
    cents.write.mode("overwrite").parquet(s"$dir/coarse")
    slotted.write.mode("overwrite").parquet(s"$dir/codebooks")
    stored.write.mode("overwrite").parquet(s"$dir/codes")

    // the persisted code lists hold NO raw vectors — one row per vector,
    // 8 one-byte codes (as global codebook slots) is the whole stored
    // representation
    val codeCols = spark.read.parquet(s"$dir/codes").columns.toSet
    assert(codeCols === Set("cand_id", "cell", "codes"))

    val fromStore = ops.Similarity.ivfPqAttachIncrement(spark,
      e.filter($"is_new").select($"vec_id", $"ne"),
      spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes"))
    val inQuery = SparkEntry.queries("ann_ivfpq_incremental")(spark, sf)
    assert(fromStore.count() === inQuery.count())
    assert(fromStore.exceptAll(inQuery).isEmpty &&
      inQuery.exceptAll(fromStore).isEmpty)
  }

  test("output invariants: disjoint ids, dense ranks, single routed cell") {
    import spark.implicits._
    val rep = SparkEntry.queries("ann_ivfpq_incremental")(spark, sf).cache()
    // increment ids and index ids are disjoint by the hash split
    assert(rep.filter($"inc_id" === $"cand_id").count() === 0)
    // ranks are 1..k per inc_id with k ≤ 3
    val bad = rep.groupBy($"inc_id")
      .agg(count(lit(1)).as("k"), max($"rank").as("mx"), min($"rank").as("mn"))
      .filter($"mn" =!= 1 || $"mx" =!= $"k" || $"k" > 3)
    assert(bad.count() === 0)
    // every increment routes to exactly one coarse cell
    val multi = rep.groupBy($"inc_id")
      .agg(countDistinct($"cell").as("nc")).filter($"nc" =!= 1)
    assert(multi.count() === 0)
    rep.unpersist()
  }
}
