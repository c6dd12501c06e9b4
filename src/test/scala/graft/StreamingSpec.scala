package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Feeds the sf0.001 events table through a MemoryStream and checks
  * the streaming event-time operators agree with their batch twins —
  * the §2.8 proof that the engine's event-time semantics lift onto
  * `readStream` unchanged.
  */
class StreamingSpec extends SparkSpecBase {

  private def eventRows: Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
  }

  private def runToTable(df: org.apache.spark.sql.DataFrame, name: String,
                         mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling window agrees with the batch op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // two chunks to exercise incremental state, not one giant batch
    val (a, b) = eventRows.splitAt(eventRows.size / 2)
    src.addData(a: _*)
    src.addData(b: _*)
    runToTable(EventStream.tumblingCounts(src.toDF()), "tumbling", "complete")

    val got = spark.table("tumbling")
      .select($"hour_start", $"event_type", $"n_events")
    val want = SparkEntry.queries("window_tumbling")(spark, sf)
      .select($"hour_start", $"event_type", $"n_events")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming session windows agree with the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    src.addData(eventRows: _*)
    runToTable(EventStream.sessionCounts(src.toDF()), "sessions", "complete")

    // batch twin: compare (user, start, end, n) multisets; the batch op
    // numbers sessions, the streaming op identifies them by their span
    val got = spark.table("sessions")
      .select($"user_id", $"session_start", $"n_events")
    val want = SparkEntry.queries("event_sessions")(spark, sf)
      .select($"user_id", $"session_start", $"n_events")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mapGroupsWithState running counts reach the batch totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val (a, b) = eventRows.splitAt(eventRows.size / 3)
    src.addData(a: _*)
    src.addData(b: _*)
    runToTable(EventStream.runningTypeCounts(src.toDS()).toDF("event_type", "n"),
      "running", "update")

    // update mode emits one row per key per trigger; the LAST value per
    // key must equal the batch count
    val finalCounts = spark.table("running")
      .groupBy($"event_type").agg(max($"n").as("n"))
    val want = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    assert(finalCounts.exceptAll(want).isEmpty && want.exceptAll(finalCounts).isEmpty)
  }
}
