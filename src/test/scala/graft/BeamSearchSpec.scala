package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Pins `ann_graph_search`'s frontier contract: the beam walk's
  * recall@5 beats the ivfpq scan family's (the verdict target — at
  * sf0.1 the measured point is 0.68 recall @ 244 candidates vs
  * ivfpq's 0.35 @ 245, equal cost), the reported top-1 cosine is the
  * true cosine of the returned pair, and the cost accounting is
  * internally consistent (n_hits ≤ 5, n_cand ≥ the entry fan-out,
  * recall = n_hits/5).
  */
class BeamSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private val bsf = "/root/testdata/sf0.01"

  test("beam recall@5 beats the ivfpq family's on the same corpus") {
    val graph = SparkEntry.queries("ann_graph_search")(spark, bsf)
      .agg(avg(col("recall_at_5"))).head.getDouble(0)
    val ivfpq = SparkEntry.queries("ann_recall_report")(spark, bsf)
      .filter(col("family") === "ivfpq")
      .agg(avg(col("recall_at_5"))).head.getDouble(0)
    assert(graph > ivfpq,
      s"beam recall $graph must beat ivfpq $ivfpq")
  }

  test("reported top-1 cosine is the true cosine; accounting consistent") {
    GraftFunctions.ensure(spark)
    val out = SparkEntry.queries("ann_graph_search")(spark, bsf).cache()
    assert(out.count() === 20)
    assert(out.filter(col("n_hits") > 5 || col("n_hits") < 0).count() === 0)
    assert(out.filter(col("n_cand") < 4).count() === 0,
      "every query scores at least the entry fan-out")
    assert(out.filter(
      abs(col("recall_at_5") - col("n_hits") / 5.0) > 1e-9).count() === 0)
    // recompute the top-1 cosine straight from the raw vectors
    val e = Tables.embeddings(spark, bsf).select($"vec_id",
      expr("vec_normalize(CAST(embedding AS array<double>))").as("ne"))
    val recomputed = out
      .join(e.select($"vec_id".as("query_id"), $"ne".as("nq")), "query_id")
      .join(e.select($"vec_id".as("top_cand"), $"ne".as("nc")), "top_cand")
      .withColumn("want",
        expr("CAST(FLOOR(vec_dot(nq, nc) * 1000000 + 0.5) AS DOUBLE)" +
          " / 1000000"))
    assert(recomputed.filter(col("top_cosine") =!= col("want"))
      .count() === 0, "top_cosine must be the true pair cosine")
    assert(out.filter(col("top_cand") === col("query_id")).count() === 0)
    out.unpersist()
  }
}
