package graft

/** `privacy_svt` (sparse vector technique): the engine's three-scalar
  * hit-position formulation must agree with a SEQUENTIAL reference
  * simulation of Dwork & Roth Alg. 2 (walk the queries in order,
  * re-draw the threshold after each hit, halt after c), and the halt
  * semantics must hold structurally.
  */
class SvtSpec extends SparkSpecBase {

  private val C = 3
  private val T = 70.0
  private val Eps = 1.0

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def lap(scale: Double, tag: String): Double = {
    val u = (h60(tag) % 2000001L - 1000000L) / 1000001.0
    -scale * math.signum(u) * math.log(1.0 - math.abs(u))
  }

  /** Sequential reference: probe in nation-key order, epoch threshold
    * re-drawn after each hit, halt after [[C]] hits. */
  private def refStatuses(counts: Seq[(Long, Long)]): Map[Long, String] = {
    var k = 1
    counts.sortBy(_._1).map { case (nk, n) =>
      val st =
        if (k > C) "not_probed"
        else {
          val nq = n + lap(4.0 * C / Eps, s"svt_q:$nk")
          if (nq >= T + lap(2.0 * C / Eps, s"svt_t:$k")) { k += 1; "above" }
          else "below"
        }
      nk -> st
    }.toMap
  }

  private def cust(counts: (Int, Int)*) = {
    import spark.implicits._
    counts.flatMap { case (nk, n) =>
      (0 until n).map(i => (nk.toLong * 100000 + i, nk))
    }.toDF("c_custkey", "c_nationkey")
  }

  private def gotStatuses(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("nation_key") ->
      r.getAs[String]("status")).toMap

  test("engine agrees with the sequential reference on a planted stream") {
    // floor groups carry ONE member (a zero-count nation emits no
    // customer rows at all and so is not a query in the stream)
    val counts = (0 to 24).map(k =>
      k -> (if (Set(5, 10, 15, 20)(k)) 10000 else 1))
    val got = gotStatuses(ops.Curation.svtOf(cust(counts: _*)))
    val ref = refStatuses(counts.map { case (k, n) => (k.toLong, n.toLong) })
    assert(got === ref)
    // the giants dominate every noise draw: exactly they can be hits,
    // and the fourth giant falls past the halt
    assert(got(5L) === "above" && got(10L) === "above" &&
      got(15L) === "above" && got(20L) === "not_probed")
  }

  test("engine agrees with the sequential reference on testdata") {
    import spark.implicits._
    val counts = Tables.customer(spark, sf)
      .groupBy($"c_nationkey".cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val got = gotStatuses(SparkEntry.queries("privacy_svt")(spark, sf))
    assert(got === refStatuses(counts))
  }

  test("halt semantics: at most c hits, nothing probed after the last") {
    val rows = SparkEntry.queries("privacy_svt")(spark, sf)
      .collect().map(r => (r.getAs[Int]("pos"), r.getAs[String]("status")))
    val hits = rows.filter(_._2 == "above").map(_._1)
    assert(hits.length <= C)
    if (hits.length == C) {
      val h3 = hits.max
      rows.foreach { case (p, st) =>
        if (p > h3) assert(st === "not_probed", s"pos $p")
        else assert(st !== "not_probed", s"pos $p")
      }
    } else assert(rows.forall(_._2 != "not_probed"))
  }
}
