package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming lift of the engine's event-time operators
  * (SURVEY §2.8). The reference is pure batch, so the DuckDB oracle
  * gate covers the batch twins in [[graft.ops.Events]]; this module is
  * the `readStream → transforms → writeStream` form of the same
  * semantics, exercised in `StreamingSpec` by feeding the identical
  * testdata through a MemoryStream and comparing against the batch
  * results.
  *
  * Scale design: all three shapes keep state partitioned by their
  * group key (window bucket / session key / event type), so state
  * size tracks live keys, and the watermark bounds how long a window
  * stays open — the knobs that keep a 100 TB/day stream's state from
  * growing without bound.
  */
object EventStream {

  /** One event row as fed by the streaming source. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Hourly tumbling counts + exact decimal value sums per event type —
    * watermarked, so the sink can run in append mode once windows
    * close. Identical aggregation shape AND identical decimal-exact
    * accumulation to the oracle-checked batch `window_tumbling`: the
    * streaming state carries the decimal accumulator, so incremental
    * merge order across micro-batches cannot perturb the total. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.sumExact(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour windows on a 15-minute slide — the streaming form
    * of the batch `window_sliding` op: each event feeds 4 overlapping
    * windows (expanded row-local by the `window()` generator before
    * the map-side combine), state is one aggregate per live
    * (window, type), and the watermark seals windows for append-mode
    * emission. Same decimal-exact accumulation as [[tumblingCounts]]. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.sumExact(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming ingest dedup of the EVENTS feed via the native
    * `dropDuplicatesWithinWatermark` operator — the declarative
    * counterpart of the custom-state [[firstSeenTtl]] processor (and
    * the composite-key sibling of the document-hash
    * [[dedupWithinWatermark]]): one suppression-state row per key,
    * evicted once the watermark passes the key's event time + delay
    * (bounded state at any stream volume; duplicates in real feeds
    * arrive close together).
    *
    * The frame is projected to the DEDUP KEY ITSELF before the
    * operator: within a micro-batch the surviving physical row per
    * key is arbitrary, so emitting only key columns makes the output
    * survivor-independent — the deterministic-output discipline every
    * gated op follows. With `delay` spanning the whole drained corpus
    * no state evicts mid-run, so the sink equals the exact batch
    * DISTINCT — which is what the oracle states; the delay is the
    * production bounded-state knob, not an observable of this run. */
  def dedupEventKeys(events: DataFrame,
                     delay: String = "30 days"): DataFrame =
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** Gap-based sessions via Spark's native `session_window` — the
    * streaming counterpart of the batch `event_sessions` op (30-minute
    * inactivity gap). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** One document row as fed to the streaming dedup stage. */
  case class Doc(doc_id: Long, content_hash: String)

  /** Streaming exact dedup — the corpus-prep pipeline's first stage
    * ([[graft.ops.Dedup]] `dedup_exact`) lifted to a stream: one
    * surviving document per content hash. Within a micro-batch the
    * survivor is the min doc_id (the batch op's deterministic survivor
    * rule); across batches it is first-seen — the only causally
    * possible choice on an unbounded stream. State is one boolean per
    * hash, partitioned by hash exactly like the batch shuffle; for
    * bounded state on an infinite stream use
    * [[dedupWithinWatermark]]. */
  def dedupByHash(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(rows.minBy(_.doc_id)) }
      }
  }

  /** One crawl-document row as fed to the streaming contamination
    * gate (doc_id + raw text — fingerprints derive in-flight). */
  case class CrawlDoc(doc_id: Long, text: String)

  /** MemoryStream row shape for the vector-ingest specs. */
  case class VecRow(vec_id: Long, embedding: Array[Float])

  /** A crawl document with its feed tag — the [[qualityGateRates]]
    * stream element. */
  case class SourcedDoc(doc_id: Long, text: String, source: String)

  /** Static (benchmark) side of the decontamination gate: distinct
    * probe 5-gram fingerprints with each probe's gram count ATTACHED
    * per row — so the streaming side needs no join AFTER its
    * aggregation (stream-static joins are legal only before stateful
    * ops). Tiny by construction: eval sets are KBs against a corpus
    * of TBs — always a broadcast. */
  def contaminationProbe(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val p = graft.ops.Corpus.contaminationGrams(
        docs.filter($"doc_id" < graft.ops.Corpus.ProbeMaxId))
      .select($"doc_id".as("probe_id"), $"gh")
    p.join(p.groupBy($"probe_id").agg(count(lit(1)).as("n_probe")),
      "probe_id")
  }

  /** Stream-static decontamination — the batch `text_contamination`
    * rule applied IN-FLIGHT to a crawl stream: each micro-batch's
    * documents fingerprint row-locally (tokenize → 5-word shingles →
    * per-row distinct → hash, the exact batch gram function), join the
    * BROADCAST static probe table statelessly, and one complete-mode
    * aggregation folds per-(doc, probe) overlaps across batches; the
    * threshold filter and containment ratio are stateless post-agg
    * decorations. Drained, the sink equals the batch result exactly —
    * the same oracle gates both. State is one counter per
    * (contaminated doc × probe) pair — bounded by the MATCH volume,
    * not the stream; clean documents hold no state at all. */
  def contaminationMatches(docs: DataFrame, probe: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.ops.Corpus.contaminationGrams(
        docs.filter($"doc_id" >= graft.ops.Corpus.ProbeMaxId))
      .join(broadcast(probe), "gh")
      .groupBy($"doc_id", $"probe_id", $"n_probe")
      .agg(count(lit(1)).as("overlap"))
      .filter($"overlap" >= graft.ops.Corpus.ContamMinOverlap)
      .select($"doc_id", $"probe_id", $"overlap",
        graft.functions.Exact.roundHalfUp(
          lit(1.0) * $"overlap" / $"n_probe", 6).as("containment"))
  }

  /** Streaming SEMANTIC decontamination against the persisted
    * SemDeDup survivor store — the embedding twin of
    * [[contaminationMatches]] (which gates on lexical n-grams): every
    * arriving NEW-batch vector normalizes row-locally, assigns to its
    * frozen k-means cell via the codegen'd `pq_argmin` over ONE
    * broadcast packed-codebook row (a stream-static cross join of a
    * 1-row frame — no state), then stream-static-joins the survivor
    * store on the cell and keeps matches at cosine ≥
    * [[graft.ops.Similarity.SemTau]]. Entirely STATELESS: no
    * watermark, no aggregation state — every match emits in the
    * micro-batch its vector arrives in, so the drained sink equals
    * the batch derivation exactly (the oracle), with no sealed-window
    * cutoff.
    *
    * Scale: per arriving vector one codegen'd argmin over the
    * broadcast codebook + one cell-keyed join against the
    * cell-bounded survivor slice — the Σ|cell|² SemDeDup bound
    * applies per micro-batch; store payloads are (id, vector, cell)
    * rows, refreshed by the nightly batch job, never rebuilt by the
    * stream. */
  def semanticMatches(emb: DataFrame, cents: DataFrame,
                      surv: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val newSide = graft.ops.Similarity.normalize(emb.sparkSession,
        emb.filter(graft.ops.Dedup.isNewBatch($"vec_id")))
      .select($"vec_id", $"ne")
    graft.ops.Similarity.assignCells(newSide, cents)
      .join(surv.select($"vec_id".as("store_id"), $"ne".as("no"),
        $"cell"), "cell")
      .filter(expr("vec_dot(ne, no)") >= graft.ops.Similarity.SemTau)
      .select($"vec_id", $"store_id",
        graft.functions.Exact.roundHalfUp(
          expr("vec_dot(ne, no)"), 6).as("cosine"))
  }

  /** Streaming ingest quality gate — the crawl-time filter dashboard:
    * every arriving document scores ROW-LOCALLY through the learned
    * classifier ([[graft.ops.Curation.classifierScoredOf]] — the
    * weight vector is a broadcast 1-row frame, so the stage is
    * stateless), and ONE complete-mode fold maintains per-SOURCE doc
    * and keep counts, mean score, and the live keep rate — the gauge
    * an operator watches to catch a feed going bad mid-crawl. State
    * is one counter row per source, never per document; scores sum
    * as DECIMAL(27,6) so the running mean is batch-identical under
    * any micro-batch slicing. Drained, the sink equals the batch
    * per-source summary — the oracle. */
  def qualityGateRates(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.ops.Curation.classifierScoredOf(docs)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"keep".cast("long")).as("n_keep"),
        sum($"score".cast("decimal(27,6)")).as("ssum"))
      .select($"source", $"n_docs", $"n_keep",
        graft.functions.Exact.roundHalfUp(
          $"ssum".cast("double") / $"n_docs", 6).as("mean_score"),
        graft.functions.Exact.roundHalfUp(
          lit(1.0) * $"n_keep" / $"n_docs", 6).as("keep_rate"))
  }

  /** Built-in bounded-state dedup: first document per content hash
    * within the watermark horizon (`dropDuplicatesWithinWatermark`).
    * Duplicates arriving after the horizon re-emit — the standard
    * tradeoff that keeps dedup state finite on an unbounded stream;
    * the horizon is the dedupe-window knob. */
  def dedupWithinWatermark(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("content_hash"))

  /** Per-key survivor state for [[latestPerKey]]. */
  case class Latest(ts: java.sql.Timestamp, event_id: Long,
                    event_type: String, value: Double, n_versions: Long)

  /** Streaming CDC latest-wins compaction — the batch `cdc_upsert`
    * ([[graft.ops.Events]]) lifted to a stream: per user, the record
    * with the greatest (ts, event_id) plus a version count, emitted
    * every trigger (update mode). State is one small record per key —
    * the materialized-view shape for a CDC topic. The survivor rule is
    * the SAME total order as the batch op's max_by, so replaying a log
    * through the stream converges to the batch answer regardless of
    * how micro-batches slice it. */
  def latestPerKey(events: Dataset[Event]): Dataset[(Long, Latest)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Latest, (Long, Latest)](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[Latest]) =>
          var cur = state.getOption
          rows.foreach { e =>
            val newer = cur.forall { c =>
              val cmp = e.ts.compareTo(c.ts)
              cmp > 0 || (cmp == 0 && e.event_id > c.event_id)
            }
            val n = cur.map(_.n_versions).getOrElse(0L) + 1
            cur =
              if (newer) Some(Latest(e.ts, e.event_id, e.event_type, e.value, n))
              else Some(cur.get.copy(n_versions = n))
          }
          state.update(cur.get)
          key -> cur.get
      }
  }

  /** [[latestPerKey]] re-expressed on Spark 4's `transformWithState` —
    * the arbitrary-stateful-processing API that supersedes
    * `mapGroupsWithState`: named typed state variables (value/list/map)
    * with optional TTL, timers, and schema evolution, backed by the
    * RocksDB state store (the only provider implementing the new state
    * encoding — `runStream` pins it for the query). One
    * `ValueState[Latest]` per user holds the survivor under the SAME
    * (ts, event_id) total order as the batch `cdc_upsert`, so replaying
    * the changelog through this processor converges to the batch
    * compaction under any micro-batch slicing — proven through the
    * DuckDB gate (`stream_cdc_tws`). At scale the win over
    * mapGroupsWithState is operational: per-variable TTL bounds state
    * without hand-rolled timeout logic, and RocksDB spills state off
    * the executor heap. */
  class LatestProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Latest)] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Latest] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[Latest]("latest",
        org.apache.spark.sql.Encoders.product[Latest],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Latest)] = {
      var cur = if (state.exists()) Some(state.get()) else None
      rows.foreach { e =>
        val newer = cur.forall { c =>
          val cmp = e.ts.compareTo(c.ts)
          cmp > 0 || (cmp == 0 && e.event_id > c.event_id)
        }
        val n = cur.map(_.n_versions).getOrElse(0L) + 1
        cur =
          if (newer) Some(Latest(e.ts, e.event_id, e.event_type, e.value, n))
          else Some(cur.get.copy(n_versions = n))
      }
      state.update(cur.get)
      Iterator.single(key -> cur.get)
    }
  }

  def latestPerKeyTws(events: Dataset[Event]): Dataset[(Long, Latest)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new LatestProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Stream-stream interval join: every error event matched to the
    * same user's click events in the preceding 10 minutes — the
    * attribution/funnel join, and the one streaming shape none of the
    * keyed-state ops above cover. BOTH sides carry a watermark and the
    * join condition bounds `click_ts` to a closed interval behind
    * `error_ts`, which is exactly what lets Spark derive a finite
    * state-retention horizon per side and evict buffered rows as the
    * watermark advances — the contract that keeps stream⋈stream state
    * bounded on an unbounded stream. Inner join, append mode; on any
    * fully-arrived data the result equals the identical batch join
    * (`StreamingSpec` proves it on testdata). */
  def clickErrorJoin(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
      .withWatermark("error_ts", watermark)
    errors.join(clicks,
      expr("c_user_id = user_id AND " +
        "click_ts >= error_ts - INTERVAL 10 MINUTES AND click_ts <= error_ts"))
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }

  /** LEFT OUTER stream⋈stream interval join — the subtle half of
    * Spark's stream-join surface: matched rows emit as both sides
    * arrive (like the inner join), but an error with NO click in its
    * trailing 10-minute window emits a null-padded row only once the
    * WATERMARK proves no future click can match (future clicks have
    * `click_ts ≥ watermark`). Spark derives the eviction bound from
    * the lower-bound constraint (`click_ts ≥ error_ts − 10 min` ⟹
    * error state held until `error_ts < watermark − 10 min`, one join
    * window PAST the point no match is possible — measured, and
    * mirrored exactly in the oracle's seal predicate). State retention
    * is therefore watermark delay + window, as in the inner form; the
    * null-padded rows are the new part. */
  def clickErrorJoinOuter(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"),
        col("event_id").as("error_id"))
      .withWatermark("error_ts", watermark)
    errors.join(clicks,
      expr("c_user_id = user_id AND " +
        "click_ts >= error_ts - INTERVAL 10 MINUTES AND click_ts <= error_ts"),
      "leftOuter")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Idempotent micro-batch writer — the `foreachBatch` exactly-once
    * recipe on a plain file sink: every micro-batch lands in a
    * batch-id-keyed directory with overwrite semantics, so a batch
    * REPLAYED after a failure (the at-least-once delivery Structured
    * Streaming guarantees into `foreachBatch`) overwrites its own
    * directory instead of appending duplicates. Exposed as the writer
    * function so the idempotence contract is directly testable; wire
    * it with `df.writeStream.foreachBatch(writeBatchIdempotent(dir))`. */
  def writeBatchIdempotent(outDir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** One closed session for [[timeoutSessions]]. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-split run of event times (micros) inside [[timeoutSessions]]. */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** Per-key pending event times (micros) carried between micro-batches
    * by [[timeoutSessions]] — only events whose session the watermark
    * has not yet sealed, so state is bounded by each key's event count
    * inside the (watermark delay + gap) horizon, not the stream. */
  case class Pending(ts: Seq[Long])

  /** Gap sessionization with EVENT-TIME TIMEOUT state eviction — the
    * third sessionization form next to the batch window op and the
    * native `session_window`: custom keyed state that emits a session
    * only when the watermark passes its gap horizon
    * (`GroupStateTimeout.EventTimeTimeout`), the mechanism that closes
    * sessions for users who simply STOP sending events (neither the
    * batch op nor in-batch logic ever sees a "no more events" signal —
    * the timeout is that signal).
    *
    * Batch parity under OUT-OF-ORDER cross-batch delivery: a key's
    * pending event times are buffered in state until the watermark
    * passes `run_end + gap` (the same buffer-until-watermark contract
    * `session_window` honors), so a late event the watermark still
    * admits lands in its correct position — splitting, extending, or
    * MERGING runs exactly as the batch op would — instead of mutating
    * a prematurely-frozen open session. A run is emitted only once it
    * is unreachable by any admissible future event (every future event
    * has `t >= watermark > run_end + gap`). */
  // Event times are handled in MICROS end-to-end (testdata timestamps
  // carry micros; Timestamp.getTime alone would truncate to millis and
  // de-sync the gap comparison from the batch op's unix_micros).
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000
  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  def timeoutSessions(events: Dataset[Event],
                      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    // gap-split a sorted micros array into maximal runs
    def runs(ts: Array[Long]): List[OpenSession] = {
      val out = List.newBuilder[OpenSession]
      var i = 0
      while (i < ts.length) {
        var j = i
        while (j + 1 < ts.length && ts(j + 1) - ts(j) <= gapUs) j += 1
        out += OpenSession(ts(i), ts(j), j - i + 1)
        i = j + 1
      }
      out.result()
    }
    def emit(uid: Long, rs: List[OpenSession]): Iterator[Session] =
      rs.iterator.map(r => Session(uid, tsOf(r.start), tsOf(r.end), r.n))

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Pending, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Pending]) =>
          // seal-and-rearm shared by both entry paths: emit the closed
          // prefix, keep the rest, and arm the timeout on the EARLIEST
          // pending run's gap horizon — arming on the last run's would
          // hold a user's sealed early sessions hostage to their recent
          // activity (a perpetually-active key would never flush)
          def seal(buf: Array[Long]): Iterator[Session] = {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // run ends increase across runs, so "sealed" is a prefix:
            // a run is closed once no admissible event can reach it
            val (closed, pending) = runs(buf).partition(_.end + gapUs < wmUs)
            if (pending.isEmpty) state.remove()
            else {
              val keepFrom = pending.head.start
              state.update(Pending(buf.filter(_ >= keepFrom).toIndexedSeq))
              // the timeout API takes event-time MILLIS; round the micros
              // horizon UP so the timeout never fires a hair early, and
              // keep it strictly above the current watermark (API contract)
              state.setTimeoutTimestamp(Math.max(
                Math.floorDiv(pending.head.end + gapUs + 999, 1000),
                state.getCurrentWatermarkMs() + 1))
            }
            emit(uid, closed)
          }
          if (state.hasTimedOut) seal(state.get.ts.toArray.sorted)
          else seal((state.getOption.map(_.ts).getOrElse(Seq.empty[Long]) ++
            rows.map(e => micros(e.ts))).toArray.sorted)
      }
  }

  /** Gap sessionization on `transformWithState` with EVENT-TIME
    * TIMERS — [[timeoutSessions]] re-expressed on Spark 4's new API:
    * each user's pending event times ride a `ListState[Long]`
    * (compacted on every seal), and the "this user went quiet" signal
    * is a REGISTERED event-time timer at the earliest pending run's
    * gap horizon, delivered to `handleExpiredTimer` — the first-class
    * form of what the old API spelled as `GroupStateTimeout`. A timer
    * that fires after a data batch already sealed its runs finds empty
    * state and emits nothing (stale timers are harmless by
    * construction). Emission contract identical to [[timeoutSessions]]
    * — a run seals once `end + gap` falls strictly below the
    * ms-floored watermark, on data arrival or on timer expiry — so the
    * two APIs share one DuckDB oracle. */
  class SessionProcessor(gapMinutes: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, Session] {
    private val gapUs = gapMinutes * 60000000L
    @transient private var pending: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      pending = getHandle.getListState[Long]("pending",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def runsOf(ts: Array[Long]): List[OpenSession] = {
      val out = List.newBuilder[OpenSession]
      var i = 0
      while (i < ts.length) {
        var j = i
        while (j + 1 < ts.length && ts(j + 1) - ts(j) <= gapUs) j += 1
        out += OpenSession(ts(i), ts(j), j - i + 1)
        i = j + 1
      }
      out.result()
    }

    private def seal(uid: Long, buf: Array[Long], wmMs: Long): Iterator[Session] = {
      val wmUs = wmMs * 1000L
      val (closed, pend) = runsOf(buf).partition(_.end + gapUs < wmUs)
      if (pend.isEmpty) pending.clear()
      else {
        val keepFrom = pend.head.start
        pending.put(buf.filter(_ >= keepFrom))
        // event-time timers take MILLIS; round the micros horizon UP so
        // the timer never fires a hair early, and keep it strictly
        // above the current watermark (API contract)
        getHandle.registerTimer(Math.max(
          Math.floorDiv(pend.head.end + gapUs + 999, 1000), wmMs + 1))
      }
      closed.iterator.map(r => Session(uid, tsOf(r.start), tsOf(r.end), r.n))
    }

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[Session] = {
      val prior = if (pending.exists()) pending.get().toArray else Array.empty[Long]
      seal(uid, (prior ++ rows.map(e => micros(e.ts))).sorted,
        timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(uid: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] =
      if (!pending.exists()) Iterator.empty
      else seal(uid, pending.get().toArray.sorted, timers.getCurrentWatermarkInMs())
  }

  def sessionsTws(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** First event per (user, type) with TTL-BOUNDED state — the
    * transformWithState form of streaming dedup where the dedup window
    * is declared as a per-variable `TTLConfig` instead of hand-rolled
    * timeout logic: the store evicts a key's seen-marker `ttl` after
    * its last update, so a duplicate arriving later re-emits — the
    * standard bounded-state tradeoff, now one configuration line.
    * Within a batch the survivor is the min-(ts, event_id) row (the
    * batch op's deterministic rule); across batches it is first-seen.
    * State is one small marker per live (user, type) inside the TTL
    * horizon — the knob that keeps dedup state finite on an unbounded
    * stream. */
  case class FirstSeen(ts: java.sql.Timestamp, event_id: Long, value: Double)

  class FirstSeenProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Long, String), Event, (Long, String, java.sql.Timestamp, Long, Double)] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[FirstSeen] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[FirstSeen]("seen",
        org.apache.spark.sql.Encoders.product[FirstSeen],
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: (Long, String), rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, String, java.sql.Timestamp, Long, Double)] = {
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.minBy(e => (micros(e.ts), e.event_id))
        seen.update(FirstSeen(first.ts, first.event_id, first.value))
        Iterator.single((key._1, key._2, first.ts, first.event_id, first.value))
      }
    }
  }

  // State TTL is only legal in ProcessingTime mode ([STATEFUL_PROCESSOR_
  // INCORRECT_TIME_MODE_TO_ASSIGN_TTL]) — and in that mode a drained
  // AvailableNow run keeps scheduling no-data micro-batches (each paying
  // a full per-partition RocksDB checkpoint commit), so the GATE wrapper
  // disables no-data batches for the query; a real always-on deployment
  // WANTS them (they are what fires TTL eviction between arrivals).
  def firstSeenTtl(events: Dataset[Event],
                   ttl: java.time.Duration = java.time.Duration.ofHours(24))
      : Dataset[(Long, String, java.sql.Timestamp, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new FirstSeenProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Per-user event-type count matrix on `MapState` — the new API's
    * keyed sub-map state (one map entry per type under each user key,
    * individually updatable — a `ValueState[Map]` would rewrite the
    * whole map per event): the per-entity feature-vector shape a
    * training pipeline streams (user × action counts). Update mode
    * re-emits a user's changed entries each trigger; the entries are
    * monotone counts, so the max per (user, type) in the sink is the
    * final matrix. */
  class TypeMatrixProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, String, Long)] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, String, Long)] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
        touched += e.event_type
      }
      touched.iterator.map(t => (uid, t, counts.getValue(t)))
    }
  }

  def typeMatrix(events: Dataset[Event]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeMatrixProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-(hour, type) bucketed-histogram value quantiles — the
    * streaming twin of the batch `events_winsorize` percentile pass,
    * in the SKEW-ROBUST two-level shape (chained windowed
    * aggregations, the Spark-3.4+ multi-stateful-operator form, append
    * mode):
    *
    *  1. raw rows combine MAP-SIDE into (hour, type, value-bucket)
    *     counts — a hot (hour, type) pair fans out across its value
    *     buckets and collapses before the shuffle, so no reducer ever
    *     sees a hot key's raw rows;
    *  2. a second windowed agg folds each group's ≤(range/width)-entry
    *     histogram into interpolation-free p01/p99 bucket bounds via a
    *     cumulative-count walk (`aggregate` over the bucket-sorted
    *     entries).
    *
    * State: one count per live (hour, type, bucket) at level 1, one
    * histogram per live (hour, type) at level 2 — both sealed by the
    * watermark, both independent of row volume. Exact percentiles need
    * a global sort per group; bucket bounds are the streamable
    * contract (width = resolution knob), and the SAME plan runs in
    * batch mode for the parity spec. */
  def windowedValueQuantiles(events: DataFrame, bucketWidth: Double = 1.0,
                             watermark: String = "2 hours"): DataFrame = {
    val bucketed = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"),
        floor(col("value") / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // first bucket where the cumulative count reaches ceil(q*n): the
    // same integer walk the DuckDB oracle runs, so results hash-match
    def qExpr(q: String): String =
      s"""CAST(aggregate(hist,
         |  named_struct('cum', CAST(0 AS BIGINT), 'b', CAST(NULL AS BIGINT)),
         |  (acc, e) -> IF(acc.b IS NOT NULL, acc, named_struct(
         |    'cum', acc.cum + e.cnt,
         |    'b', IF(acc.cum + e.cnt >= GREATEST(CAST(1 AS BIGINT),
         |                CAST(CEIL($q * n_events) AS BIGINT)),
         |            e.bucket, CAST(NULL AS BIGINT)))),
         |  acc -> acc.b) AS DOUBLE) * $bucketWidth""".stripMargin
    bucketed
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        sort_array(collect_list(struct(col("bucket"), col("cnt")))).as("hist"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"),
        expr(qExpr("0.01")).as("p01_lo"), expr(qExpr("0.99")).as("p99_lo"))
  }

  /** Per-hour join-key width/skew report — the streaming twin of the
    * batch `diag_skew` key-width diagnostic, same two-level chained-
    * windowed-agg shape as [[windowedValueQuantiles]]: level 1 counts
    * each (hour, user) width with map-side combine (the hot user's
    * rows collapse before they move), level 2 reduces KEYS (not rows)
    * into the per-hour max-width / skew-ratio summary a pipeline
    * watches to catch a hot key before it melts a downstream join. */
  def windowedKeySkew(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("w"))
      .groupBy(window(col("window"), "1 hour"))
      .agg(count(lit(1)).as("n_keys"), max(col("w")).as("max_width"),
        sum(col("w")).as("n_events"))
      .select(col("window.start").as("hour_start"), col("n_keys"),
        col("max_width"), col("n_events"),
        graft.functions.Exact.roundHalfUp(
          lit(1.0) * col("max_width") * col("n_keys") / col("n_events"), 6)
          .as("skew_ratio"))

  /** Custom keyed state via `mapGroupsWithState`: cumulative per-type
    * event counts, emitted every trigger (update mode). The state is
    * one long per key — the minimal template for richer per-key
    * accumulators (sketches, session carts, model features). */
  def runningTypeCounts(events: Dataset[Event]): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          key -> total
      }
  }
}
