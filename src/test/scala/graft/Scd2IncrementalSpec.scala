package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Pins `scd2_incremental`'s merge contract: the parquet store path is
  * rebuild-identical, and the boundary semantics — same-type boundary
  * leaves the open interval open, a type change closes it at the first
  * new change, unseen keys start fresh history, untouched keys pass
  * through — are hand-pinned on a crafted CDC fixture.
  */
class Scd2IncrementalSpec extends SparkSpecBase {

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("store path: parquet dimension store reproduces the catalog op") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val maxTs = ev.agg(max($"ts")).head.getTimestamp(0)
    val cutoff = new Timestamp(maxTs.getTime - 7L * 86400 * 1000)
    val dir = java.nio.file.Files.createTempDirectory("scd2store").toString
    ops.Events.scd2Of(ev.filter($"ts" < lit(cutoff)))
      .write.parquet(s"$dir/dim")
    val fromStore = ops.Events.scd2Merge(
      spark.read.parquet(s"$dir/dim"), ev.filter($"ts" >= lit(cutoff)))
    val inQuery = SparkEntry.queries("scd2_incremental")(spark, sf)
    assert(fromStore.collect().toSeq === inQuery.collect().toSeq)
  }

  test("merge boundary semantics pinned by hand") {
    import spark.implicits._
    // store: user 1 history A(0..10) then B(10..open); user 2 C(0..open)
    val oldEv = Seq(
      (1L, "A", ts(0), 1L), (1L, "B", ts(10), 2L),
      (2L, "C", ts(0), 3L),
      (3L, "D", ts(0), 4L)).toDF("user_id", "event_type", "ts", "event_id")
    val store = ops.Events.scd2Of(oldEv)
    // batch: user 1 continues B (no change) then flips to A;
    // user 2 sends only C (no change at all); user 4 is brand new;
    // user 3 untouched
    val newEv = Seq(
      (1L, "B", ts(20), 5L), (1L, "A", ts(30), 6L),
      (2L, "C", ts(25), 7L),
      (4L, "E", ts(21), 8L)).toDF("user_id", "event_type", "ts", "event_id")
    val out = ops.Events.scd2Merge(store, newEv).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    val expected = Seq(
      (1L, "A", ts(0), Some(ts(10)), false),
      (1L, "B", ts(10), Some(ts(30)), false), // closed at the A flip
      (1L, "A", ts(30), None, true),
      (2L, "C", ts(0), None, true),           // same-type batch: stays open
      (3L, "D", ts(0), None, true),           // untouched key passes through
      (4L, "E", ts(21), None, true))          // unseen key starts history
    assert(out.toSeq === expected)
    // merge == full rebuild on the union, row for row
    val rebuild = ops.Events.scd2Of(oldEv.unionByName(newEv))
      .orderBy($"user_id", $"valid_from", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq === rebuild.toSeq)
  }
}
