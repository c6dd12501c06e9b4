package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Pins the SemDeDup contract (cluster-bounded near-dup removal):
  * the output is a subset of the input that (a) actually drops rows on
  * this data, (b) always keeps each cell's smallest vec_id (nothing
  * smaller exists in-cell to evict it), and (c) drops a row IFF some
  * smaller-id vector in the SAME cell clears the cosine threshold —
  * re-derived here by brute force within cells, independent of the
  * operator's join shape. */
class SemanticDedupSpec extends SparkSpecBase {

  private val Tau = 0.4

  private lazy val kept =
    SparkEntry.queries("semantic_dedup")(spark, sf).cache()

  // Independent reconstruction of the assignment the operator uses.
  private lazy val assigned = {
    val e = Similarity.normalize(spark, Tables.embeddings(spark, sf))
    Similarity.assignCells(
      e.select(col("vec_id"), col("ne")),
      Similarity.kmeansCentroids(spark, e, 16, 2)).cache()
  }

  private lazy val total = assigned.count()

  test("drops engage on this data, and output is a strict subset") {
    val k = kept.count()
    assert(k > 0 && k < total, s"kept=$k of $total")
    assert(kept.join(assigned, Seq("vec_id", "cell")).count() === k)
  }

  test("each cell's minimum vec_id always survives") {
    val mins = assigned.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(mins.join(kept, Seq("vec_id"), "left_anti").count() === 0)
  }

  test("dropped IFF a smaller same-cell vector clears the threshold") {
    val a = assigned.select(col("vec_id").as("va"), col("ne").as("na"),
      col("cell"))
    val b = assigned.select(col("vec_id").as("vb"), col("ne").as("nb"),
      col("cell"))
    val shouldDrop = a.join(b, Seq("cell"))
      .filter(col("va") < col("vb") &&
        expr("vec_dot(na, nb)") >= lit(Tau))
      .select(col("vb").as("vec_id")).distinct()
    val dropped = assigned.select("vec_id")
      .join(kept.select("vec_id"), Seq("vec_id"), "left_anti")
    assert(dropped.join(shouldDrop, Seq("vec_id"), "left_anti").count() === 0)
    assert(shouldDrop.join(dropped, Seq("vec_id"), "left_anti").count() === 0)
  }
}
