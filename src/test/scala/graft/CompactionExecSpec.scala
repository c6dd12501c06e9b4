package graft

import org.apache.spark.sql.functions._

/** Pins `layout_compaction_exec`'s executed-rewrite contract: the
  * compacted store holds exactly the planned bins (read-unit count =
  * the plan's bin count — per-bin stats granules of the sorted flat
  * store, not physical files; see the op's read-unit accounting note),
  * conserves every row, never merges across the p_month partition
  * boundary (zone maps stay month-bounded, so partition pruning
  * survives), and the probe cost drops by at least the merge factor's
  * worth.
  */
class CompactionExecSpec extends SparkSpecBase {

  test("executed bins match the plan; rows conserved; probes improve") {
    val out = SparkEntry.queries("layout_compaction_exec")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (postF, postR, postHit) = out("postcompact")
    val (preF, preR, preHit) = out("precompact")
    // row conservation through the real parquet rewrite
    assert(postR === preR, "the rewrite lost or duplicated rows")
    // executed read-unit (bin) count equals the planner's bin count
    val plannedBins = SparkEntry.queries("layout_compaction")(spark, sf)
      .count()
    assert(postF === plannedBins,
      s"executed $postF bins vs $plannedBins planned bins")
    // compaction merged something, and the probe cost tracks it
    assert(postF < preF, "no read units were merged")
    assert(postHit < preHit,
      "a point probe should open fewer read units after compaction")
  }

  test("bins never cross the p_month partition boundary") {
    import spark.implicits._
    // zone maps of the compacted store: every file's [lo, hi] must sit
    // inside one calendar month, or month-level pruning is broken
    val back = spark.read.parquet(
      // the op stages under Sources' tmpRoot; re-running it here makes
      // the read-back path deterministic for this spec
      ops.Sources.compactedPathForSpec(spark, sf))
    val crossing = back.groupBy($"p_month", $"bin")
      .agg(min($"l_shipdate").as("lo"), max($"l_shipdate").as("hi"))
      .filter(year($"lo") * 100 + month($"lo") =!=
        year($"hi") * 100 + month($"hi"))
    assert(crossing.count() === 0)
  }
}
