package graft

import org.apache.spark.sql.functions._

/** Pins `semantic_dedup_incremental`'s store contract: the parquet
  * store path (frozen centroids + survivor set) is decision-identical
  * to the in-query op, stored survivors are never evicted, and no
  * emitted survivor has a ≥ τ stored-survivor neighbor in its cell.
  */
class SemanticIncrementalSpec extends SparkSpecBase {

  private def pieces() = {
    import spark.implicits._
    expressions.GraftFunctions.ensure(spark)
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
      .cache()
    val oldE = e.filter(!ops.Dedup.isNewBatch($"vec_id"))
    val cents = ops.Similarity.kmeansCentroids(spark, oldE, 16, 2)
    val asg = ops.Similarity.assignCells(e.select($"vec_id", $"ne"), cents)
      .withColumn("isnew", ops.Dedup.isNewBatch($"vec_id")).cache()
    val oldAsg = asg.filter(!$"isnew")
    val dropped = oldAsg.select($"vec_id".as("va"), $"ne".as("na"), $"cell")
      .join(oldAsg.select($"vec_id".as("vb"), $"ne".as("nb"), $"cell"),
        Seq("cell"))
      .filter($"va" < $"vb" && expr("vec_dot(na, nb)") >= 0.4)
      .select($"vb".as("vec_id")).distinct()
    val oldSurv = oldAsg.join(dropped, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"ne", $"cell")
    (cents, asg, oldSurv)
  }

  test("store path: parquet centroid + survivor stores reproduce the op") {
    import spark.implicits._
    val (cents, asg, oldSurv) = pieces()
    val dir = java.nio.file.Files.createTempDirectory("semstore").toString
    cents.write.parquet(s"$dir/cents")
    oldSurv.write.parquet(s"$dir/surv")
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
    val newAsg = ops.Similarity.assignCells(
        e.filter(ops.Dedup.isNewBatch($"vec_id")).select($"vec_id", $"ne"),
        spark.read.parquet(s"$dir/cents"))
      .select($"vec_id", $"ne", $"cell")
    val fromStore = ops.Similarity.semanticIncrementalCore(newAsg,
      spark.read.parquet(s"$dir/surv"))
    val inQuery =
      SparkEntry.queries("semantic_dedup_incremental")(spark, sf)
    assert(fromStore.collect().toSeq === inQuery.collect().toSeq)
  }

  test("no survivor keeps a >= tau stored neighbor; store is never evicted") {
    import spark.implicits._
    val (_, asg, oldSurv) = pieces()
    val out = SparkEntry.queries("semantic_dedup_incremental")(spark, sf)
    // every emitted id is from the new batch
    assert(out.filter(!ops.Dedup.isNewBatch($"vec_id")).count() === 0)
    // the drop rule actually bit on this corpus (non-vacuous)
    assert(out.count() < asg.filter($"isnew").count())
    // no surviving new doc has a stored survivor >= tau in its cell
    val bad = out.select($"vec_id")
      .join(asg.select($"vec_id", $"ne", $"cell"), Seq("vec_id"))
      .select($"vec_id", $"ne".as("nn"), $"cell")
      .join(oldSurv.select($"ne".as("no"), $"cell"), Seq("cell"))
      .filter(expr("vec_dot(nn, no)") >= 0.4)
    assert(bad.count() === 0)
  }
}
