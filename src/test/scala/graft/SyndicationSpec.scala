package graft

import org.apache.spark.sql.functions._

/** Pins `corpus_source_syndication` to its pair source: the matrix is
  * by construction `dedup_minhash`'s pair set folded by source pair,
  * so the tallies must reconcile exactly, and the matrix keys must be
  * normalized unordered pairs.
  */
class SyndicationSpec extends SparkSpecBase {

  private lazy val rep =
    SparkEntry.queries("corpus_source_syndication")(spark, sf).collect()

  test("pair tallies reconcile exactly with dedup_minhash") {
    val exactPairs = SparkEntry.queries("dedup_minhash")(spark, sf).count()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === exactPairs)
  }

  test("matrix keys are normalized unordered pairs with consistent flags") {
    for (r <- rep) {
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a <= b, s"unnormalized pair ($a, $b)")
      assert(r.getAs[Boolean]("cross_source") === (a != b))
      assert(r.getAs[Double]("mean_jaccard") >= 0.8 - 1e-6,
        "folded pairs all passed the 0.8 gate")
    }
  }
}
