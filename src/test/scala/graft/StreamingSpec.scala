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

    // value sums must match EXACTLY (decimal-exact accumulation makes
    // the incremental micro-batch merge equal the batch result)
    val got = spark.table("tumbling")
      .select($"hour_start", $"event_type", $"n_events", $"total_value")
    val want = SparkEntry.queries("window_tumbling")(spark, sf)
      .select($"hour_start", $"event_type", $"n_events", $"total_value")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming DP counts: perturbed at release, same domain as the tumbling agg") {
    val dp = SparkEntry.queries("stream_dp_counts")(spark, sf).cache()
    val base = SparkEntry.queries("stream_tumbling")(spark, sf)
      .select(col("hour_start"), col("event_type"), col("n_events"))
    // one release row per (window, type), exactly the aggregate's domain
    assert(dp.select("hour_start", "event_type")
      .exceptAll(base.select("hour_start", "event_type")).isEmpty)
    assert(dp.count() === base.count())
    // Laplace(1)-bounded at the hash grid's tail, and actually perturbed
    val j = dp.join(base, Seq("hour_start", "event_type"))
      .select((col("noisy_count") - col("n_events")).as("noise"))
    assert(j.filter(abs(col("noise")) > 13.9).count() === 0)
    assert(j.filter(abs(col("noise")) > 1e-9).count() > 0)
    // deterministic across re-drains
    val again = SparkEntry.queries("stream_dp_counts")(spark, sf)
    assert(dp.exceptAll(again).isEmpty && again.exceptAll(dp).isEmpty)
    dp.unpersist()
  }

  test("streaming contamination equals the batch op across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    expressions.GraftFunctions.ensure(spark)
    val docRows = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (i, t) => EventStream.CrawlDoc(i, t) }.toSeq
    val src = MemoryStream[EventStream.CrawlDoc]
    // three chunks: aggregation state from earlier batches must merge
    // with later arrivals in complete mode
    val third = docRows.size / 3
    src.addData(docRows.take(third): _*)
    src.addData(docRows.slice(third, 2 * third): _*)
    src.addData(docRows.drop(2 * third): _*)
    val probe = EventStream.contaminationProbe(Tables.documents(spark, sf))
    runToTable(EventStream.contaminationMatches(src.toDF(), probe),
      "contam_stream", "complete")
    val got = spark.table("contam_stream")
    val want = SparkEntry.queries("text_contamination")(spark, sf)
    assert(want.count() > 0, "fixture must contain contaminated docs")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming semantic decontamination equals the batch derivation across splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    expressions.GraftFunctions.ensure(spark)
    val vecRows = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (i, e) => EventStream.VecRow(i, e) }.toSeq
    val src = MemoryStream[EventStream.VecRow]
    // three chunks: the gate is stateless, so any slicing must emit
    // exactly the batch match set
    val third = vecRows.size / 3
    src.addData(vecRows.take(third): _*)
    src.addData(vecRows.slice(third, 2 * third): _*)
    src.addData(vecRows.drop(2 * third): _*)
    val (cents, surv) = ops.Similarity.semanticSurvivorStore(spark, sf)
    runToTable(EventStream.semanticMatches(src.toDF(), cents, surv),
      "semantic_stream", "append")
    val got = spark.table("semantic_stream")
    val want = EventStream.semanticMatches(
      Tables.embeddings(spark, sf).select($"vec_id", $"embedding"),
      cents, surv)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every match clears the SemTau gate and pairs a NEW vector with a
    // STORE survivor
    assert(got.filter($"cosine" < ops.Similarity.SemTau - 1e-6).count() === 0)
    val survIds = surv.select($"vec_id".as("store_id"))
    assert(got.join(survIds, Seq("store_id"), "left_anti").count() === 0)
  }

  test("streaming quality gate equals the batch fold across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    expressions.GraftFunctions.ensure(spark)
    val docRows = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
      .map { case (i, t, src) => EventStream.SourcedDoc(i, t, src) }.toSeq
    val src = MemoryStream[EventStream.SourcedDoc]
    // three chunks: the per-source counters and decimal score sums
    // must merge across micro-batches to the batch answer
    val third = docRows.size / 3
    src.addData(docRows.take(third): _*)
    src.addData(docRows.slice(third, 2 * third): _*)
    src.addData(docRows.drop(2 * third): _*)
    runToTable(EventStream.qualityGateRates(src.toDF()),
      "qgate_stream", "complete")
    val got = spark.table("qgate_stream")
    val want = SparkEntry.queries("stream_quality_gate")(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the gauge covers every document exactly once
    assert(got.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .head.getLong(0) === Tables.documents(spark, sf).count())
  }

  test("streaming dedup suppresses cross-batch duplicates = batch DISTINCT") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val (a, b) = eventRows.splitAt(eventRows.size / 2)
    src.addData(a: _*)
    src.addData(b: _*)
    // replay the first chunk as a third batch — every key in it is a
    // cross-batch duplicate the suppression state must swallow (the
    // 30-day delay keeps all state live and no replayed row falls
    // below the watermark)
    src.addData(a: _*)
    runToTable(EventStream.dedupEventKeys(src.toDF()), "dedup_ww",
      "append")
    val got = spark.table("dedup_ww")
    val want = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts").distinct()
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

  test("streaming exact dedup agrees with the batch survivor rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select($"doc_id",
        md5(graft.functions.TextFns.normalizeText($"text")).as("content_hash"))
      .as[EventStream.Doc].collect().toSeq

    val src = MemoryStream[EventStream.Doc]
    val q = EventStream.dedupByHash(src.toDS()).toDF()
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    // all docs in one batch, so min-doc_id survivors match the batch op
    src.addData(docs: _*)
    q.processAllAvailable()
    val afterFirst = spark.table("streamdedup").count()
    // the whole corpus AGAIN — every hash is in state, nothing may emit
    src.addData(docs: _*)
    q.processAllAvailable()
    val afterSecond = spark.table("streamdedup").count()
    q.stop()

    val want = SparkEntry.queries("dedup_exact")(spark, sf)
    assert(afterFirst === want.count())
    assert(afterSecond === afterFirst)
    val got = spark.table("streamdedup").select($"doc_id", $"content_hash")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("watermarked dedup keeps one row per hash within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    src.addData((1L, at(0), "h1"), (2L, at(1), "h1"), (3L, at(2), "h2"),
      (4L, at(3), "h1"))
    runToTable(
      EventStream.dedupWithinWatermark(
        src.toDF().toDF("doc_id", "ts", "content_hash")),
      "wmdedup", "append")
    val got = spark.table("wmdedup")
    assert(got.count() === 2)
    assert(got.groupBy($"content_hash").count().filter($"count" > 1).isEmpty)
  }

  test("event-time timeout closes sessions equal to the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStream.timeoutSessions(src.toDS()).toDF()
      .writeStream.format("memory").queryName("tosessions")
      .outputMode("append").start()
    // batch 1: the whole real corpus (in-batch gaps close inline; each
    // user's last session parks in state with timeout = end + gap)
    src.addData(eventRows: _*)
    q.processAllAvailable()
    // batch 2 raises the watermark high-water mark; batch 3 runs WITH
    // that watermark (it advances between batches), firing every
    // parked session's event-time timeout
    def sentinel(d: String, id: Long) = Event(id,
      java.sql.Timestamp.valueOf(d), -1L, "view", 0.0)
    src.addData(sentinel("2025-01-01 00:00:00", -1L))
    q.processAllAvailable()
    src.addData(sentinel("2025-01-02 00:00:00", -2L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tosessions").filter($"user_id" >= 0)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
    val want = SparkEntry.queries("event_sessions")(spark, sf)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("out-of-order cross-batch events sessionize exactly like the batch op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStream.timeoutSessions(src.toDS()).toDF()
      .writeStream.format("memory").queryName("ooosessions")
      .outputMode("append").start()
    def ev(id: Long, uid: Long, t: String) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, "view", 0.0)
    // batch 1: user 1 has two 30-min-gap-split runs; user 2 one event
    src.addData(
      ev(1, 1, "2024-06-01 00:00:00"), ev(2, 1, "2024-06-01 00:40:00"),
      ev(3, 2, "2024-06-01 01:00:00"))
    q.processAllAvailable()
    // batch 2, STILL inside the 2h watermark: a late event at 00:20
    // lands BETWEEN user 1's runs and must MERGE them into one session;
    // user 2's late 00:45 event must extend the session start BACKWARD
    src.addData(ev(4, 1, "2024-06-01 00:20:00"), ev(5, 2, "2024-06-01 00:45:00"))
    q.processAllAvailable()
    // advance the watermark (twice: it updates between batches), firing
    // every parked session's event-time timeout
    src.addData(ev(-1, -1, "2024-06-02 00:00:00"))
    q.processAllAvailable()
    src.addData(ev(-2, -1, "2024-06-03 00:00:00"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ooosessions").filter($"user_id" >= 0)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSet
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // the batch answer over the full (merged) event set
    assert(got === Set(
      (1L, t("2024-06-01 00:00:00"), t("2024-06-01 00:40:00"), 3L),
      (2L, t("2024-06-01 00:45:00"), t("2024-06-01 01:00:00"), 2L)))
  }

  test("a sealed early session flushes while its key's later session stays open") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStream.timeoutSessions(src.toDS()).toDF()
      .writeStream.format("memory").queryName("earlyflush")
      .outputMode("append").start()
    def ev(id: Long, uid: Long, t: String) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, "view", 0.0)
    // user 1: session A at 00:00 and session B at 05:00, both parked.
    // The timeout must arm on A's horizon (00:30), not B's (05:30) —
    // otherwise a perpetually-active key holds its sealed early
    // sessions hostage.
    src.addData(ev(1, 1, "2024-06-01 00:00:00"), ev(2, 1, "2024-06-01 05:00:00"))
    q.processAllAvailable()
    // watermark reaches 03:00 (max 05:00 − 2h): past A's horizon,
    // short of B's. Two sentinel batches: wm updates between batches.
    src.addData(ev(-1, -1, "2024-06-01 05:00:00"))
    q.processAllAvailable()
    src.addData(ev(-2, -1, "2024-06-01 05:00:01"))
    q.processAllAvailable()
    val got = spark.table("earlyflush").filter($"user_id" === 1)
      .select($"session_start", $"session_end", $"n_events")
      .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    q.stop()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // A emitted alone; B still buffered when the query stops
    assert(got === Set((t("2024-06-01 00:00:00"), t("2024-06-01 00:00:00"), 1L)))
  }

  test("timer-based tws sessionizer seals early sessions and matches the batch op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[Event]
      val q = EventStream.sessionsTws(src.toDS()).toDF()
        .writeStream.format("memory").queryName("twssessions")
        .outputMode("append").start()
      def ev(id: Long, uid: Long, t: String) =
        Event(id, java.sql.Timestamp.valueOf(t), uid, "view", 0.0)
      // user 1 has sessions at 00:00 and 05:00; the registered timer
      // must sit at session A's horizon (00:30), so the 03:00 watermark
      // fires it and flushes A while B stays pending
      src.addData(ev(1, 1, "2024-06-01 00:00:00"), ev(2, 1, "2024-06-01 05:00:00"))
      q.processAllAvailable()
      src.addData(ev(-1, -1, "2024-06-01 05:00:00"))
      q.processAllAvailable()
      src.addData(ev(-2, -1, "2024-06-01 05:00:01"))
      q.processAllAvailable()
      val got = spark.table("twssessions").filter($"user_id" === 1)
        .select($"session_start", $"session_end", $"n_events")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      q.stop()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      assert(got === Set((t("2024-06-01 00:00:00"), t("2024-06-01 00:00:00"), 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("foreachBatch idempotent sink: a replayed batch id never duplicates rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fb_").toString
    val writer = EventStream.writeBatchIdempotent(dir)
    val b0 = Tables.events(spark, sf).limit(100).cache()
    val b1 = Tables.events(spark, sf)
      .orderBy($"event_id".desc).limit(50).cache()
    writer(b0.toDF(), 0L)
    writer(b0.toDF(), 0L) // at-least-once redelivery of the SAME batch
    writer(b1.toDF(), 1L)
    val out = spark.read.parquet(dir)
    assert(out.count() === 150)
    assert(out.select($"event_id").distinct().count() === 150)
    b0.unpersist(); b1.unpersist()
  }

  test("stream-stream interval join equals the identical batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // two chunks so one side's buffered state must serve later arrivals
    val (a, b) = eventRows.splitAt(eventRows.size / 2)
    src.addData(a: _*)
    src.addData(b: _*)
    runToTable(EventStream.clickErrorJoin(src.toDF()), "cejoin", "append")

    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("click_ts"),
        $"event_id".as("click_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("error_ts"), $"event_id".as("error_id"))
    val want = errors.join(clicks,
      expr("c_user_id = user_id AND " +
        "click_ts >= error_ts - INTERVAL 10 MINUTES AND click_ts <= error_ts"))
      .select($"user_id", $"error_id", $"error_ts", $"click_id", $"click_ts")
    val got = spark.table("cejoin")
    assert(got.count() > 0)
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

  test("streaming latest-wins compaction converges to the batch cdc_upsert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // three chunks so survivors must be carried and beaten across batches
    val third = eventRows.size / 3
    src.addData(eventRows.take(third): _*)
    src.addData(eventRows.slice(third, 2 * third): _*)
    src.addData(eventRows.drop(2 * third): _*)
    runToTable(
      EventStream.latestPerKey(src.toDS())
        .map { case (k, l) => (k, l.ts, l.event_id, l.event_type, l.value, l.n_versions) }
        .toDF("user_id", "last_ts", "last_event_id", "last_type", "last_value",
          "n_versions"),
      "latest", "update")

    // update mode re-emits per trigger; the final state per key is the
    // row with the greatest version count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"n_versions".desc)
    val got = spark.table("latest")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val want = SparkEntry.queries("cdc_upsert")(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("transformWithState latest-wins converges to the batch cdc_upsert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[Event]
      // three chunks: survivors must be carried in RocksDB-backed
      // ValueState and beaten across micro-batches
      val third = eventRows.size / 3
      src.addData(eventRows.take(third): _*)
      src.addData(eventRows.slice(third, 2 * third): _*)
      src.addData(eventRows.drop(2 * third): _*)
      runToTable(
        EventStream.latestPerKeyTws(src.toDS())
          .map { case (k, l) =>
            (k, l.ts, l.event_id, l.event_type, l.value, l.n_versions) }
          .toDF("user_id", "last_ts", "last_event_id", "last_type",
            "last_value", "n_versions"),
        "latest_tws", "update")

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n_versions".desc)
      val got = spark.table("latest_tws")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      val want = SparkEntry.queries("cdc_upsert")(spark, sf)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // The two-level chained-windowed-agg twins run the SAME plan in batch
  // mode; streaming parity = the append-mode result equals the batch
  // result restricted to windows the final watermark sealed
  // (window end + 2h delay ≤ max event time ⟺ hour_start + 3h ≤ max ts).
  private def sealedBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{expr, lit, max => fmax}
    val maxTs = Tables.events(spark, sf).agg(fmax("ts")).head().getTimestamp(0)
    df.filter(expr("hour_start + INTERVAL 3 HOURS") <= lit(maxTs))
  }

  test("streaming bucketed quantiles equal the batch plan over sealed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // two chunks so level-1 bucket counts and level-2 histograms both
    // merge across micro-batches, not in one degenerate batch
    val (a, b) = eventRows.splitAt(eventRows.size / 2)
    src.addData(a: _*)
    src.addData(b: _*)
    runToTable(EventStream.windowedValueQuantiles(src.toDF()), "squant", "append")

    val got = spark.table("squant")
    val want = sealedBatch(EventStream.windowedValueQuantiles(
      Tables.events(spark, sf)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming key-skew report equals the batch plan over sealed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val (a, b) = eventRows.splitAt(eventRows.size / 2)
    src.addData(a: _*)
    src.addData(b: _*)
    runToTable(EventStream.windowedKeySkew(src.toDF()), "sskew", "append")

    val got = spark.table("sskew")
    val want = sealedBatch(EventStream.windowedKeySkew(
      Tables.events(spark, sf)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
