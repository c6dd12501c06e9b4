package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** Pins `privacy_dp_user`'s contribution-bounding contract: a user
  * active in more groups than the L0 cap contributes to EXACTLY the
  * cap, a user inside the cap contributes everywhere they appear,
  * duplicate (user, group) activity collapses to one contribution,
  * and the released sensitivity column equals the cap (the ε
  * accounting the composition argument needs).
  */
class DpUserSpec extends SparkSpecBase {
  import spark.implicits._

  // noisy_count = k + Laplace-surrogate(month); invert the (public,
  // deterministic) surrogate to recover the capped count per month —
  // exactly the invertibility the NoiseModel marker warns about, used
  // here as the test oracle.
  private def cappedCounts(df: org.apache.spark.sql.DataFrame)
      : Map[String, Long] = {
    val u = (graft.functions.TextFns.hash60(
      concat(lit("dpuser:"), col("month"))) % 2000001L - 1000000L) /
      lit(1000001.0)
    df.withColumn("uu", u)
      .select(col("month"),
        round(col("noisy_count") + lit(3.0) * signum(col("uu")) *
          log(lit(1.0) - abs(col("uu")))).cast("long").as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def ord(rows: (Long, String)*) =
    rows.map { case (u, m) => (u, Date.valueOf(s"$m-15")) }
      .toDF("o_custkey", "o_orderdate")

  test("a user in more groups than the cap contributes to exactly cap") {
    // user 1 active in 6 months, users 2..4 in one month each
    val months = Seq("1993-01", "1993-02", "1993-03", "1993-04",
      "1993-05", "1993-06")
    val f = ord(months.map(m => (1L, m)) ++
      Seq((2L, "1993-01"), (3L, "1993-02"), (4L, "1993-03")): _*)
    val k = cappedCounts(ops.Curation.dpUserOf(f))
    // total contributions: user 1 exactly 3 (the cap), others 1 each
    assert(k.values.sum === 3L + 3L, k.toString)
    // the three kept months for user 1 are a hash-priority subset
    assert(months.count(m => k.getOrElse(m, 0L) -
      Seq("1993-01", "1993-02", "1993-03").count(_ == m) > 0) === 3)
  }

  test("a user inside the cap contributes everywhere; dupes collapse") {
    // user 7 in two months, with REPEAT orders in each — dedup first,
    // so each (user, month) counts once
    val f = ord((7L, "1994-01"), (7L, "1994-01"), (7L, "1994-02"),
      (7L, "1994-02"), (8L, "1994-01"))
    val k = cappedCounts(ops.Curation.dpUserOf(f))
    assert(k === Map("1994-01" -> 2L, "1994-02" -> 1L))
  }

  test("released accounting: sensitivity = l0_cap = 3, marker present") {
    val out = SparkEntry.queries("privacy_dp_user")(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("sensitivity") =!= 3L ||
      col("l0_cap") =!= 3L).count() === 0)
    assert(out.filter(col("noise_model") =!= "seeded_surrogate")
      .count() === 0)
    out.unpersist()
  }
}
