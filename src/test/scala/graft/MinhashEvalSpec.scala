package graft

import org.apache.spark.sql.functions._

/** Pins the sketch-calibration report (`dedup_minhash_eval`) to the
  * ops it calibrates: the report walks the SAME banded candidates as
  * `dedup_minhash`/`dedup_minhash_est`, so its true-dup tally must
  * reconcile exactly with the exact-verify op's output, and its
  * per-row arithmetic must be internally consistent.
  */
class MinhashEvalSpec extends SparkSpecBase {

  private lazy val rep =
    SparkEntry.queries("dedup_minhash_eval")(spark, sf).collect()

  test("per-bin arithmetic: est fraction, bounds ordering, tallies") {
    assert(rep.nonEmpty)
    for (r <- rep) {
      val est = r.getAs[Int]("est_matches")
      assert(r.getAs[Double]("est_jaccard") ===
        math.floor(est / 16.0 * 1e6 + 0.5) / 1e6)
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
      val (mn, mean, mx) = (r.getAs[Double]("min_jaccard"),
        r.getAs[Double]("mean_jaccard"), r.getAs[Double]("max_jaccard"))
      // mean is re-rounded after the fold, so allow its quantum
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"$mn/$mean/$mx")
    }
  }

  test("true-dup tally reconciles with the exact-verify op's pair count") {
    val exactPairs =
      SparkEntry.queries("dedup_minhash")(spark, sf).count()
    val totalTrue = rep.map(_.getAs[Long]("n_true")).sum
    assert(totalTrue === exactPairs,
      "every candidate pair at exact jaccard ≥ 0.8 IS a dedup_minhash row")
  }

  test("embedding calibration curve reconciles with dedup_embedding") {
    val erep =
      SparkEntry.queries("dedup_embedding_eval")(spark, sf).collect()
    assert(erep.nonEmpty)
    for (r <- erep) {
      val lvl = r.getAs[Long]("n_bands_match")
      assert(lvl >= 1, "a candidate pair shares at least one band")
      val (mn, mean, mx) = (r.getAs[Double]("min_cosine"),
        r.getAs[Double]("mean_cosine"), r.getAs[Double]("max_cosine"))
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"$mn/$mean/$mx")
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
    }
    // the 0.4-gate tally over ALL agreement levels IS the exact-verify
    // op's pair count (same candidates, same raw-cosine gate)
    val exactPairs =
      SparkEntry.queries("dedup_embedding")(spark, sf).count()
    assert(erep.map(_.getAs[Long]("n_true")).sum === exactPairs)
  }
}
