package graft

import org.apache.spark.sql.functions._

/** Pins `privacy_generalize`'s full-domain contract: the release is
  * k-anonymous, the chosen ladder level is MINIMAL (one level down a
  * violating group exists), and a hand fixture walks the band-widening
  * rung exactly.
  */
class GeneralizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("release is k-anonymous and the chosen level is minimal") {
    val out = SparkEntry.queries("privacy_generalize")(spark, sf).cache()
    assert(out.filter(col("k") < 5).count() === 0,
      "every released group must reach k >= 5")
    val lvl = out.select("gen_level").distinct().collect()
    assert(lvl.length === 1, "full-domain: ONE level for the whole release")
    val l = lvl.head.getInt(0)
    if (l > 0) {
      // minimality: the next-finer rung must violate somewhere
      val finer = ops.Curation.generalizeLevelGroups(
        Tables.customer(spark, sf), l - 1)
      assert(finer.agg(min(col("k"))).head.getLong(0) < 5,
        s"level ${l - 1} already satisfies k-anonymity — level $l not minimal")
    }
    out.unpersist()
  }

  test("hand fixture: band widening is the first satisfying rung") {
    // five same-(nation, segment) customers straddling four 1000-bands
    // but one 4000-band: level 0 violates (min group 1), level 1 is
    // the minimal satisfying rung
    val cust = Seq(
      (1L, 7L, "BUILDING", 0.0), (2L, 7L, "BUILDING", 999.0),
      (3L, 7L, "BUILDING", 1999.0), (4L, 7L, "BUILDING", 2999.0),
      (5L, 7L, "BUILDING", 3999.0)
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = ops.Curation.generalizeOf(cust).collect()
    assert(out.length === 1, out.mkString(";"))
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2),
      r.getLong(3), r.getInt(4)) === (("7", "BUILDING", "B0", 5L, 1)))
  }

  test("empty release is vacuously anonymous at the finest level") {
    val cust = Seq.empty[(Long, Long, String, Double)]
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = ops.Curation.generalizeOf(cust)
    assert(out.count() === 0)
  }

  test("dp release: composed over the k-anon level, deterministic, accounted") {
    import org.apache.spark.sql.functions._
    val cust = Tables.customer(spark, sf)
    val dp = ops.Curation.dpCountsOf(cust).cache()
    val rel = ops.Curation.generalizeOf(cust)
    // same groups, same level as the k-anonymized release — DP
    // perturbs the already-generalized artifact, never raw groups
    assert(dp.select("qi_nation", "qi_segment", "qi_band", "gen_level")
      .exceptAll(rel.select("qi_nation", "qi_segment", "qi_band",
        "gen_level")).isEmpty)
    // accounting columns are the mechanism's constants
    assert(dp.filter(col("epsilon") =!= 1.0 || col("sensitivity") =!= 1L)
      .count() === 0)
    // deterministic: a second derivation is bit-identical
    val again = ops.Curation.dpCountsOf(cust)
    assert(dp.exceptAll(again).isEmpty && again.exceptAll(dp).isEmpty)
    // the noise is real (some group moved) and Laplace(1)-bounded at
    // the hash grid's tail: |noise| <= ln(1000001) ~ 13.8
    val joined = dp.join(rel, Seq("qi_nation", "qi_segment", "qi_band"))
      .select((col("noisy_count") - col("k")).as("noise"))
    assert(joined.filter(abs(col("noise")) > 13.9).count() === 0)
    assert(joined.filter(abs(col("noise")) > 1e-9).count() > 0,
      "at least one group must actually be perturbed")
    dp.unpersist()
  }

  test("dp sum: same domain as the release, deterministic, Laplace(5000)-bounded") {
    val cust = Tables.customer(spark, sf)
    val dp = ops.Curation.dpSumOf(cust).cache()
    val rel = ops.Curation.generalizeOf(cust)
    // the sum mechanism answers over the SAME released QI domain
    assert(dp.select("qi_nation", "qi_segment", "qi_band", "gen_level")
      .exceptAll(rel.select("qi_nation", "qi_segment", "qi_band",
        "gen_level")).isEmpty)
    assert(dp.filter(col("epsilon") =!= 1.0 || col("sensitivity") =!= 5000.0)
      .count() === 0)
    val again = ops.Curation.dpSumOf(cust)
    assert(dp.exceptAll(again).isEmpty && again.exceptAll(dp).isEmpty)
    // |noise| <= (5000/1) * ln(1000001) at the hash grid's tail, and
    // the clipped per-group sum is in [0, 5000k] — together a hard
    // release bound the raw sums need not obey
    val bound = 5000.0 * math.log(1000001.0)
    val checked = dp.join(rel, Seq("qi_nation", "qi_segment", "qi_band"))
      .filter(col("noisy_sum") < -bound ||
        col("noisy_sum") > col("k") * 5000.0 + bound)
    assert(checked.count() === 0)
    dp.unpersist()
  }

  test("dp median: exponential mechanism over the release domain, grid-valued, deterministic") {
    val cust = Tables.customer(spark, sf)
    val dp = ops.Curation.dpMedianOf(cust).cache()
    val rel = ops.Curation.generalizeOf(cust)
    assert(dp.count() === rel.count(), "one released median per QI group")
    assert(dp.select("qi_nation", "qi_segment", "qi_band", "gen_level")
      .exceptAll(rel.select("qi_nation", "qi_segment", "qi_band",
        "gen_level")).isEmpty)
    // the release can only ever be a PUBLIC grid point
    assert(dp.filter(col("released_median") % 250.0 =!= 0.0 ||
      col("released_median") < 0.0 || col("released_median") > 5000.0)
      .count() === 0)
    val again = ops.Curation.dpMedianOf(cust)
    assert(dp.exceptAll(again).isEmpty && again.exceptAll(dp).isEmpty)
    dp.unpersist()
  }

  test("dp median hand fixture: a dominant-utility candidate beats any Gumbel draw") {
    import spark.implicits._
    // 50 balances at 400 + 50 at 600 (one level-0 band): candidate 500
    // splits them exactly (utility 0) while every other grid point is
    // at least 25 utility units worse — beyond the seeded Gumbel's
    // ~17-unit total spread, so the draw is provably 500
    val cust = ((1 to 50).map(i => (i.toLong, 7L, "BUILDING", 400.0)) ++
      (51 to 100).map(i => (i.toLong, 7L, "BUILDING", 600.0)))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = ops.Curation.dpMedianOf(cust).collect()
    assert(out.length === 1, out.mkString(";"))
    assert(out.head.getDouble(3) === 500.0, out.head.toString)
    assert(out.head.getInt(6) === 0, "level 0 must satisfy k-anonymity here")
  }

  test("ldp frequency: full domain, debiased estimates sum to n, deterministic") {
    val out = SparkEntry.queries("privacy_ldp_frequency")(spark, sf).cache()
    assert(out.count() === 5, "all five public segments must be released")
    val n = Tables.customer(spark, sf).count()
    assert(out.agg(sum("n_reports")).head.getLong(0) === n,
      "every record reports exactly once")
    // the k-RR identity p + (k-1)q = 1 makes the debiased estimates
    // sum EXACTLY to n (up to the 6-dp rounding of each term)
    val estSum = out.agg(sum("est_count")).head.getDouble(0)
    assert(math.abs(estSum - n) < 1e-3, s"estimates sum $estSum vs n=$n")
    val again = SparkEntry.queries("privacy_ldp_frequency")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("dp sum hand fixture: an unbounded outlier is clipped to the contribution cap") {
    import spark.implicits._
    // 15 customers force the ladder to full suppression (the outlier's
    // own band is a singleton at every finer rung); the released
    // single-group sum must reflect the CLIP (4,999,999 -> 5000), and
    // negatives clip to 0 — otherwise no finite noise bound holds
    val cust = (
      (1 to 9).map(i => (i.toLong, 7L, "BUILDING", i * 100.0)) ++
      Seq((10L, 7L, "BUILDING", -800.0), (11L, 3L, "AUTOMOBILE", 4999999.0)) ++
      (12 to 15).map(i => (i.toLong, 3L, "AUTOMOBILE", 200.0 + i))
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = ops.Curation.dpSumOf(cust).collect()
    assert(out.length === 1, out.mkString(";"))
    val clipped = (1 to 9).map(_ * 100.0).sum + 0.0 + 5000.0 +
      (12 to 15).map(200.0 + _).sum
    val noisy = out.head.getDouble(3)
    assert(math.abs(noisy - clipped) <= 5000.0 * math.log(1000001.0) + 1e-6,
      s"noisy=$noisy clipped=$clipped — the outlier leaked past the clip")
  }
}
