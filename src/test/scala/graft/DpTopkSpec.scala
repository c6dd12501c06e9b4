package graft

/** `privacy_dp_topk` (one-shot Gumbel top-k selection): with count
  * gaps far above the Gumbel noise range the selected identities must
  * be the exact top-k, the released counts must carry exactly the
  * seeded Laplace perturbation (independently recomputed), and the
  * release must never leak a true count or an unselected source.
  */
class DpTopkSpec extends SparkSpecBase {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Independent reimplementation of the released count: true count +
    * Laplace(k/ε_cnt) from the seeded draw, rounded half-up at 6 dp. */
  private def refReleased(source: String, n: Long): Double = {
    val u = (h60(s"dptopkc:$source") % 2000001L - 1000000L) / 1000001.0
    val raw = n - 6.0 * math.signum(u) * math.log(1.0 - math.abs(u))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def docs(counts: (String, Int)*) = {
    import spark.implicits._
    counts.flatMap { case (src, n) =>
      (0 until n).map(i => (src.hashCode.toLong * 100000 + i,
        s"doc $i of $src", src))
    }.toDF("doc_id", "text", "source")
  }

  test("well-separated counts select the exact top-k identities") {
    // gaps of >= 400 dominate the Gumbel range (|G| <= ~15.2 at the
    // seeded-u extremes) under the eps_sel/(2k) = 1/12 score scale
    val got = ops.Curation.dpTopkOf(
      docs("alpha" -> 1000, "beta" -> 600, "gamma" -> 300, "delta" -> 1))
      .collect()
    assert(got.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
    assert(got.map(_.getAs[String]("source")).toSeq ===
      Seq("alpha", "beta", "gamma"))
  }

  test("released counts carry exactly the seeded Laplace perturbation") {
    val truth = Map("alpha" -> 1000L, "beta" -> 600L, "gamma" -> 300L)
    val got = ops.Curation.dpTopkOf(
      docs("alpha" -> 1000, "beta" -> 600, "gamma" -> 300, "delta" -> 1))
      .collect()
    got.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Double]("released_count") ===
        refReleased(src, truth(src)), src)
      // the perturbation is nonzero: the true count never leaks verbatim
      assert(r.getAs[Double]("released_count") !== truth(src).toDouble)
    }
  }

  test("release shape: no raw count column, budget columns account") {
    val got = SparkEntry.queries("privacy_dp_topk")(spark, sf)
    assert(!got.columns.contains("n"))
    val rows = got.collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("epsilon") ===
        r.getAs[Double]("epsilon_select") + r.getAs[Double]("epsilon_count"))
      assert(r.getAs[String]("noise_model") === "seeded_surrogate")
    }
  }
}
