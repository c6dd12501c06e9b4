package graft

import org.apache.spark.sql.functions._

/** The sketch aggregates' documented error bounds are measured, not
  * assumed: at sf0.01 and sf0.1 the HLL distinct estimate must sit
  * within 5 % of exact and the approx median within 0.5 % of the exact
  * median — the same bounds the oracle rows encode as `within_bound`.
  */
class SketchAggSpec extends SparkSpecBase {

  private val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def maxRel(d: String, exact: org.apache.spark.sql.Column,
                     approx: org.apache.spark.sql.Column): Double =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(exact.as("e"), approx.as("a"))
      .select(max(abs(col("a") - col("e")) / abs(col("e"))).as("m"))
      .collect()(0).getDouble(0)

  test("HLL distinct error ≤ 5% at sf0.01 and sf0.1") {
    for (d <- sfs) {
      val m = maxRel(d, countDistinct(col("l_partkey")),
        approx_count_distinct(col("l_partkey"), 0.02))
      assert(m <= 0.05, s"HLL rel error $m at $d")
    }
  }

  test("approx median error ≤ 0.5% at sf0.01 and sf0.1") {
    for (d <- sfs) {
      val m = maxRel(d, expr("percentile(l_extendedprice, 0.5)"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)"))
      assert(m <= 0.005, s"approx median rel error $m at $d")
    }
  }

  test("linear-counting registers merge by OR across any split") {
    import spark.implicits._
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_type"), col("user_id"))
    val whole = ops.Aggregates.lcRegisters(ev)
    val a = ops.Aggregates.lcRegisters(ev.filter(col("user_id") % 2 === 0))
    val b = ops.Aggregates.lcRegisters(ev.filter(col("user_id") % 2 =!= 0))
    // OR-merge the two halves' register files, compare word-for-word
    val merged = a.select(col("event_type"), col("word"), col("w"))
      .unionByName(b.select(col("event_type"), col("word"), col("w")))
      .groupBy(col("event_type"), col("word"))
      .agg(expr("bit_or(w)").as("w"))
    val diff = merged.as("m")
      .join(whole.as("t"), Seq("event_type", "word"), "full_outer")
      .filter(col("m.w").isNull || col("t.w").isNull ||
        col("m.w") =!= col("t.w"))
    assert(diff.count() === 0)
  }

  test("linear-counting estimate lands within 10% of exact at sf0.01") {
    val out = SparkEntry.queries("agg_distinct_sketch")(
      spark, "/root/testdata/sf0.01")
    val worst = out.select(max(col("rel_err"))).head().getDouble(0)
    assert(worst <= 0.10, s"worst rel_err $worst")
  }

  test("count-min never undercounts, and top-1 is estimated tightly") {
    val out = SparkEntry.queries("agg_countmin")(
      spark, "/root/testdata/sf0.01").cache()
    // CMS is one-sided by construction: min across rows of summed
    // collisions can only meet or exceed the true count
    assert(out.filter(col("overcount") < 0).count() === 0)
    assert(out.count() === 10)
    // CMS error bound: overcount per key ≤ O(N/width); with N ≈ 60k
    // and width 256 the expected colliding mass per cell is ~234, and
    // the min across 3 independent rows sits at or below that — 6×N/w
    // is a generous-but-bounded ceiling that a broken sketch (e.g. a
    // sum instead of a min) blows through immediately
    val n = Tables.lineitem(spark, "/root/testdata/sf0.01").count()
    val worst = out.select(max(col("overcount"))).head().getLong(0)
    assert(worst <= 6 * n / 256, s"worst overcount $worst vs N=$n")
    out.unpersist()
  }

  test("daily-register rollup answers 7-day distinct within 10% at sf0.01") {
    import spark.implicits._
    val out = SparkEntry.queries("sketch_rolling_distinct")(
      spark, "/root/testdata/sf0.01").cache()
    val worst = out.select(max(col("rel_err"))).head().getDouble(0)
    assert(worst <= 0.10, s"worst rel_err $worst")
    // one row per OBSERVED day (the spine excludes empty calendar days)
    val days = Tables.events(spark, "/root/testdata/sf0.01")
      .select(to_date($"ts")).distinct().count()
    assert(out.count() === days)
    out.unpersist()
  }

  test("catalog entries report within_bound = true everywhere") {
    for (name <- Seq("agg_approx_distinct", "agg_approx_percentile")) {
      val out = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      assert(out.filter(!col("within_bound")).count() === 0, name)
    }
  }

  test("rolling quantile: the reported band contains the exact lower median") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // bucketizing is monotone, so the sketch's p50 bucket MUST contain
    // the true lower median of every trailing window — the band
    // [p50_lo, p50_hi) is an exact error bound, not an estimate
    val out = SparkEntry.queries("sketch_rolling_quantile")(spark, sf).cache()
    val win = Tables.events(spark, sf)
      .select(explode(expr("sequence(CAST(ts AS DATE), " +
        "date_add(CAST(ts AS DATE), 6))")).as("day"), $"value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"day").orderBy($"value".asc)
    val med = win
      .withColumn("rn", row_number().over(w))
      .withColumn("tot", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"day")))
      .filter($"rn" * 2 >= $"tot" && ($"rn" - 1) * 2 < $"tot")
      .groupBy($"day").agg(min($"value").as("exact_med"))
    val bad = out.join(med, "day")
      .filter($"exact_med" < $"p50_lo" || $"exact_med" >= $"p50_hi")
    assert(bad.count() === 0, "exact lower median escaped the p50 band")
    // the adaptive geometry's stated bound: band width = one step,
    // shrinking with sqrt(N) until it floors at the integer grid
    val widths = out.select(($"p50_hi" - $"p50_lo").as("w")).distinct()
    assert(widths.count() === 1)
  }

  test("agg_bitmap_overlap: bitmap intersections equal exact pairwise counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("agg_bitmap_overlap")(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"user_id").distinct().cache()
    val exact = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("x"))
    val bad = out.join(exact, Seq("type_a", "type_b"), "left")
      .filter(col("n_intersect") =!= coalesce(col("x"), lit(0L)))
    assert(bad.count() === 0,
      "word-sharded bitmap AND must equal the exact pairwise overlap")
    // union via inclusion-exclusion is consistent
    assert(out.filter(col("n_union") =!=
      col("n_a") + col("n_b") - col("n_intersect")).count() === 0)
    val types = ev.select("event_type").distinct().count()
    assert(out.count() === types * (types - 1) / 2, "every unordered pair")
  }
}
