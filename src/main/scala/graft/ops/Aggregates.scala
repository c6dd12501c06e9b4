package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFns.{hash60, hash60Sql}

/** Aggregations — SURVEY §2.4 (A1-A12).
  *
  * Every group-by here is a single hash-aggregate: partial (map-side)
  * combine, one shuffle keyed on the group columns, final merge. Group
  * cardinalities are small relative to input, so the shuffle carries
  * aggregate states, not rows — the shape that survives a 100× scale-up.
  */
object Aggregates {

  // Linear-counting register geometry: 16 words × 60 bits. 60 keeps
  // every shift strictly below 2^60 — portable signed-BIGINT territory
  // in both engines (1 << 63 is engine-defined). Declared ahead of
  // `defs`: the oracle string interpolates these during object init.
  private val LcWords = 16
  private val LcBits = 60
  private val LcM = LcWords * LcBits
  /** Production sizing for `sketch_rolling_distinct`: register bits =
    * LcScale × corpus distinct users (load factor ≤ 1/LcScale, well
    * inside linear counting's accuracy regime, nowhere near the
    * all-bits-set saturation the fixed demo geometry hit at 10×). */
  private val LcScale = 4

  // Count-min geometry: 3 independent hash60 rows × 256 counters.
  // Small on purpose — collisions must actually occur at sf0.01 so the
  // overcount column exercises the min-across-rows recovery. Like LcM,
  // declared ahead of `defs` (the oracle interpolates at object init).
  private val CmDepth = 3
  private val CmWidth = 256
  private val CmTopK = 10

  /** A1 — group-by + HAVING for duplicate detection (reference
    * `pipeline.py:117-124` app_dupes). */
  private def aggHaving(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 4)
      .orderBy($"l_orderkey")
  }

  /** A2 — multi-key group-by with exact sums (TPC-H Q1 shape;
    * reference `queries.sql:78-80`). */
  private def aggGroupBy(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumExact($"l_quantity").as("sum_qty"),
        sumExact($"l_extendedprice").as("sum_base_price"),
        sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        avgExact($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A3/A4/A5 — global (no-key) aggregate over the whole table
    * (reference `pipeline.py:393-421`). */
  private def aggGlobal(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        sumExact($"l_quantity").as("total_qty"),
        min($"l_shipdate").as("first_ship"),
        max($"l_shipdate").as("last_ship"),
        countDistinct($"l_orderkey").as("n_orders"))
  }

  /** A5 — SUM(flag::INT) failure tallies (reference `pipeline.py:396-419`). */
  private def aggSumFlags(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .agg(
        count(lit(1)).as("n_orders"),
        sum(($"o_totalprice" > 100000.0).cast("int")).cast("long").as("n_large"),
        sum(($"o_orderstatus" === "F").cast("int")).cast("long").as("n_finished"),
        sum($"o_orderdate".isNull.cast("int")).cast("long").as("n_null_date"))
  }

  /** A6 — conditional aggregates (reference `queries.sql:43-49,171-197`). */
  private def aggConditional(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_lines"),
        countWhen($"l_discount" >= 0.05).as("n_discounted"),
        countWhen($"l_quantity" >= 25.0).as("n_bulk"),
        sumExactWhen($"l_discount" >= 0.05, $"l_extendedprice").as("discounted_value"))
      .orderBy($"l_returnflag")
  }

  /** A7 — AVG over a no-ELSE CASE (NULLs skipped; reference
    * `queries.sql:68-75`). */
  private def aggAvgCase(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        roundHalfUp(avgExactWhen($"o_orderstatus" === "F", $"o_totalprice"), 2)
          .as("avg_finished_price"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** A8 — ratio-of-aggregates with NULLIF guard (reference
    * `queries.sql:50-58,138-146`). */
  private def aggRate(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("total_orders"),
        countWhen($"o_orderstatus" === "F").as("finished_orders"),
        roundHalfUp(rate(countWhen($"o_orderstatus" === "F"), count(lit(1))), 4)
          .as("finish_rate"))
      .orderBy($"o_orderpriority")
  }

  /** A9 — SELECT DISTINCT (reference `pipeline.py:427,440`). */
  private def distinctOp(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A10 — ordered list aggregate: `array_agg(x ORDER BY x)` ≡
    * `array_sort(collect_list(x))` (reference `pipeline.py:484-485`).
    * The array is serialized with `array_join` for the compare: the
    * driver's pandas-side canonicalization cannot sort/hash raw array
    * cells (round-1 `agg_array_collect` failed on exactly that), and a
    * delimiter-joined string carries identical information for a
    * deterministic, sorted list. */
  private def aggArrayCollect(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.nation(s, d)
      .groupBy($"n_regionkey")
      .agg(array_join(array_sort(collect_list($"n_name")), "|")
        .as("nation_names"))
      .orderBy($"n_regionkey")
  }

  /** A11 — scalar subquery as select-list item via 1-row cross join
    * (reference `pipeline.py:484-485`). */
  private def scalarSubquery(s: SparkSession, d: String) = {
    import s.implicits._
    val total = Tables.orders(s, d)
      .agg(sumExact($"o_totalprice").as("total_value"))
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(sumExact($"o_totalprice").as("priority_value"))
      .crossJoin(total)
      .select(
        $"o_orderpriority",
        roundHalfUp($"priority_value", 2).as("priority_value"),
        roundHalfUp($"priority_value" / $"total_value", 6).as("value_share"))
      .orderBy($"o_orderpriority")
  }

  /** Distinct-count per group (non-reference; Spark built-in). */
  private def aggCountDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_suppkey").as("n_suppliers"),
        countDistinct($"l_partkey").as("n_parts"))
      .orderBy($"l_returnflag")
  }

  /** Statistical mode per group with a deterministic tie-break (most
    * frequent lang per source; ties go to the lexicographically
    * smallest lang). Two-level: count per (source, lang) — map-side
    * combined — then a rank-1 window over the lang-count table, which
    * is sources × langs rows, so the window stage is tiny at any data
    * size and plans as a group-limit. */
  private def aggMode(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"source")
      .orderBy($"n_docs".desc, $"lang".asc)
    Tables.documents(s, d)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"source", $"lang".as("mode_lang"), $"n_docs".as("n_docs_mode"))
      .orderBy($"source")
  }

  // Bitmap-distinct geometry: 60 bits per word (same portable-BIGINT
  // rationale as [[LcBits]] — 1 << 63 is engine-defined).
  private val BmBits = 60

  /** EXACT distinct users per event type via a two-level bitmap OR —
    * the ClickHouse/roaring-bitmap pattern for exact COUNT(DISTINCT)
    * at scale without a distinct-sort: map ids to (word = id div 60,
    * bit = id mod 60), OR the masks per (type, word), then SUM the
    * popcounts per type.
    *
    * Scale: both aggregates are map-side combined; the first shuffle
    * carries one 8-byte word per (type, word-bucket) — bounded by the
    * id-space density, NOT by event count — and the word key shards
    * any hot type across partitions, so a mega-type never concentrates
    * on one task the way `COUNT(DISTINCT)`'s single per-type state
    * does. `bit_count`/`bit_or` are codegen'd integer ops in both
    * engines; bits stay below 2^60 so every mask is portable signed
    * BIGINT. Exactness is self-checked against the built-in
    * COUNT(DISTINCT) in the same row.
    *
    * Id-space contract: user_id must be NON-NEGATIVE. For negative
    * ids Spark `div` truncates toward zero while DuckDB `//` floors,
    * `%` yields a negative bit index, and shiftleft by a negative
    * amount is undefined — so the op asserts the contract up front
    * (`raise_error` on the first negative id) rather than failing
    * later via a silent hash mismatch. */
  /** Per-(type, word) bitmap words — the shared first level of the
    * bitmap family (`agg_bitmap_distinct`, `agg_bitmap_overlap`).
    * Asserts the non-negative-id contract up front. */
  private def bitmapWords(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select($"event_type",
        when($"user_id" < 0, expr(
          "raise_error('bitmap ops: negative user_id — " +
            "bitmap id-space contract requires non-negative ids')"))
          .otherwise($"user_id").as("user_id"))
      .select($"event_type", expr(s"user_id div $BmBits").as("word"),
        expr(s"shiftleft(1L, CAST(user_id % $BmBits AS INT))").as("mask"))
      .groupBy($"event_type", $"word")
      .agg(expr("bit_or(mask)").as("bm"))
  }

  private def aggBitmapDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    val words = bitmapWords(Tables.events(s, d))
      .groupBy($"event_type")
      .agg(sum(expr("bit_count(bm)")).cast("long").as("n_distinct_bitmap"),
        count(lit(1)).as("n_words"))
    val exact = Tables.events(s, d)
      .groupBy($"event_type")
      .agg(count_distinct($"user_id").as("n_distinct_exact"))
    words.join(exact, "event_type")
      .select($"event_type", $"n_distinct_bitmap", $"n_distinct_exact",
        $"n_words")
      .orderBy($"event_type")
  }

  /** EXACT audience overlap between every pair of event types from
    * the SAME per-(type, word) bitmap words [[bitmapWords]] builds —
    * the segment-overlap engine pattern: intersection is a word-keyed
    * join + `bit_count(a & b)` per shared word (word-sharded, so a
    * mega-segment fans across partitions), union is inclusion-
    * exclusion on the popcounts — user ids are NEVER pairwise-joined;
    * the pair stage touches one 8-byte word per (pair, word-bucket),
    * bounded by id-space density at any event volume. Pairs with no
    * shared word surface with intersection 0 via the size-table cross
    * (|types|² rows, trivially broadcast). */
  private def aggBitmapOverlap(s: SparkSession, d: String) = {
    import s.implicits._
    val words = bitmapWords(Tables.events(s, d)).cache() // sizes + pair join
    val sizes = words.groupBy($"event_type")
      .agg(sum(expr("bit_count(bm)")).cast("long").as("n"))
    val inter = words.select($"event_type".as("type_a"), $"word", $"bm".as("ba"))
      .join(words.select($"event_type".as("type_b"), $"word", $"bm".as("bb")),
        Seq("word"))
      .filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(sum(expr("bit_count(ba & bb)")).cast("long").as("n_intersect"))
    sizes.select($"event_type".as("type_a"), $"n".as("n_a"))
      .join(sizes.select($"event_type".as("type_b"), $"n".as("n_b")),
        $"type_a" < $"type_b")
      .join(inter, Seq("type_a", "type_b"), "left")
      .select($"type_a", $"type_b", $"n_a", $"n_b",
        coalesce($"n_intersect", lit(0L)).as("n_intersect"))
      .withColumn("n_union", $"n_a" + $"n_b" - $"n_intersect")
      .withColumn("jaccard",
        roundHalfUp(lit(1.0) * $"n_intersect" / $"n_union", 6))
      .orderBy($"type_a", $"type_b")
  }

  private def bitmapOverlapOracle: String =
    s"""WITH words AS (
       |  SELECT event_type, user_id // $BmBits AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % $BmBits AS INT)) AS bm
       |  FROM events
       |  GROUP BY 1, 2
       |),
       |sizes AS (
       |  SELECT event_type, CAST(SUM(bit_count(bm)) AS BIGINT) AS n
       |  FROM words GROUP BY event_type
       |),
       |inter AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    CAST(SUM(bit_count(a.bm & b.bm)) AS BIGINT) AS n_intersect
       |  FROM words a JOIN words b
       |    ON a.word = b.word AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |)
       |SELECT sa.event_type AS type_a, sb.event_type AS type_b,
       |  sa.n AS n_a, sb.n AS n_b,
       |  CAST(COALESCE(i.n_intersect, 0) AS BIGINT) AS n_intersect,
       |  sa.n + sb.n - CAST(COALESCE(i.n_intersect, 0) AS BIGINT) AS n_union,
       |  ${roundHalfUpSql(
      "1.0 * COALESCE(i.n_intersect, 0) / " +
        "(sa.n + sb.n - COALESCE(i.n_intersect, 0))", 6)} AS jaccard
       |FROM sizes sa JOIN sizes sb ON sa.event_type < sb.event_type
       |LEFT JOIN inter i
       |  ON i.type_a = sa.event_type AND i.type_b = sb.event_type
       |ORDER BY type_a, type_b""".stripMargin

  private def bitmapDistinctOracle: String =
    s"""WITH words AS (
       |  SELECT event_type, user_id // $BmBits AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % $BmBits AS INT)) AS bm
       |  FROM events
       |  GROUP BY 1, 2
       |),
       |bitmap AS (
       |  SELECT event_type,
       |    CAST(SUM(bit_count(bm)) AS BIGINT) AS n_distinct_bitmap,
       |    COUNT(*) AS n_words
       |  FROM words GROUP BY event_type
       |),
       |exact AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT b.event_type, b.n_distinct_bitmap, e.n_distinct_exact, b.n_words
       |FROM bitmap b JOIN exact e ON e.event_type = b.event_type
       |ORDER BY b.event_type""".stripMargin

  // Quantile-sketch geometry: bucket COUNT scales as √N from a one-row
  // stats job (floored at 32, capped explicitly at 2^20 counters so
  // per-day state is bounded — the cap is in BOTH engines, never
  // silent), bucket WIDTH is the integer step covering the measured
  // [min, max] value range. 7-day trailing merge window.
  private val QsMinBuckets = 32
  private val QsMaxBuckets = 1048576
  private val QsWindow = 7

  /** Mergeable quantile sketch with period rollup — the quantile twin
    * of `sketch_rolling_distinct`, with the same production geometry
    * treatment: a one-row stats job measures N and the value range,
    * buckets = max([[QsMinBuckets]], ⌈√N⌉) (capped at
    * [[QsMaxBuckets]]), step = the integer width covering the range —
    * so the error bound is STATED and shrinking: p50 lies in
    * [p50_lo, p50_hi), a band of width step = max(1, ⌈range/√N⌉),
    * instead of the old fixed 32×16 grid whose error was frozen at 16
    * and whose clamp silently swallowed any value past 512. Each day's
    * distribution collapses to ≤ buckets counters; the trailing
    * [[QsWindow]]-day estimate MERGES daily sketches (counter
    * addition — no re-scan of event rows).
    *
    * Scale: the stats job is one map-side-combined row; daily sketches
    * are one aggregate onto |days|×occupied-buckets rows (occupancy is
    * bounded by BOTH the bucket cap and the integer value range —
    * once step hits 1 the histogram is exact to the integer floor);
    * the trailing merge explodes day INDEXES over sketch rows only;
    * the p50 walk is a per-day window over sketch rows. Persisted
    * daily sketches answer any trailing-window quantile without
    * touching raw data — the equal-width grid trades accuracy
    * (bounded, reported per row) for O(1)-merge state, the same deal
    * HLL strikes for distincts. */
  private def sketchRollingQuantile(s: SparkSession, d: String) = {
    import s.implicits._
    val geo = Tables.events(s, d)
      .agg(count(lit(1)).as("nn"),
        expr("CAST(FLOOR(MIN(value)) AS BIGINT)").as("vmin"),
        (expr("CAST(FLOOR(MAX(value)) AS BIGINT)") + lit(1L)).as("vmax"))
      .select($"vmin", $"vmax",
        least(greatest(lit(QsMinBuckets.toLong),
          expr("CAST(CEIL(SQRT(nn)) AS BIGINT)")), lit(QsMaxBuckets.toLong))
          .as("b"))
      .select($"vmin", $"b",
        greatest(lit(1L), expr("(vmax - vmin + b - 1) div b")).as("step"))
    val daily = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"value")
      .crossJoin(broadcast(geo))
      .select($"day", least($"b" - 1,
        expr("(CAST(FLOOR(value) AS BIGINT) - vmin) div step")).as("bucket"))
      .groupBy($"day", $"bucket").agg(count(lit(1)).as("n"))
    val merged = daily
      .select(explode(expr(s"sequence(day, date_add(day, ${QsWindow - 1}))"))
        .as("day"), $"bucket", $"n")
      .groupBy($"day", $"bucket").agg(sum($"n").as("n"))
    val cum = Window.partitionBy($"day").orderBy($"bucket".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"day")
    merged
      .withColumn("cum", sum($"n").over(cum))
      .withColumn("total", sum($"n").over(tot))
      .filter($"cum" * 2 >= $"total" &&
        ($"cum" - $"n") * 2 < $"total")
      .crossJoin(broadcast(geo))
      .select($"day", $"total".as("n_7d"), $"bucket".cast("int").as("p50_bucket"),
        ($"vmin" + $"bucket" * $"step").cast("double").as("p50_lo"),
        ($"vmin" + ($"bucket" + 1) * $"step").cast("double").as("p50_hi"))
      .orderBy($"day")
  }

  private def rollingQuantileOracle: String =
    s"""WITH geo0 AS (
       |  SELECT CAST(FLOOR(MIN(value)) AS BIGINT) AS vmin,
       |    CAST(FLOOR(MAX(value)) AS BIGINT) + 1 AS vmax,
       |    LEAST(GREATEST($QsMinBuckets, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)),
       |      $QsMaxBuckets) AS b
       |  FROM events
       |),
       |geo AS (
       |  SELECT vmin, b, GREATEST(1, (vmax - vmin + b - 1) // b) AS step
       |  FROM geo0
       |),
       |daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    LEAST(g.b - 1,
       |      (CAST(FLOOR(value) AS BIGINT) - g.vmin) // g.step) AS bucket,
       |    COUNT(*) AS n
       |  FROM events CROSS JOIN geo g GROUP BY 1, 2
       |),
       |merged AS (
       |  SELECT d.day + CAST(t.k AS INT) AS day, bucket, SUM(n) AS n
       |  FROM daily d CROSS JOIN range($QsWindow) t(k)
       |  GROUP BY 1, 2
       |),
       |walked AS (
       |  SELECT day, bucket, n,
       |    SUM(n) OVER (PARTITION BY day ORDER BY bucket ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(n) OVER (PARTITION BY day) AS total
       |  FROM merged
       |)
       |SELECT day, CAST(total AS BIGINT) AS n_7d, CAST(bucket AS INT) AS p50_bucket,
       |  CAST(g.vmin + bucket * g.step AS DOUBLE) AS p50_lo,
       |  CAST(g.vmin + (bucket + 1) * g.step AS DOUBLE) AS p50_hi
       |FROM walked CROSS JOIN geo g
       |WHERE cum * 2 >= total AND (cum - n) * 2 < total
       |ORDER BY day""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("sketch_rolling_quantile", sketchRollingQuantile _, rollingQuantileOracle),
    OpDef("agg_bitmap_distinct", aggBitmapDistinct _, bitmapDistinctOracle),
    OpDef("agg_bitmap_overlap", aggBitmapOverlap _, bitmapOverlapOracle),
    OpDef("agg_mode", aggMode _,
      """WITH counts AS (
        |  SELECT source, lang, COUNT(*) AS n_docs
        |  FROM documents GROUP BY source, lang
        |),
        |ranked AS (
        |  SELECT source, lang, n_docs,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_docs DESC, lang ASC) AS rn
        |  FROM counts
        |)
        |SELECT source, lang AS mode_lang, n_docs AS n_docs_mode
        |FROM ranked WHERE rn = 1
        |ORDER BY source""".stripMargin),
    OpDef("agg_having", aggHaving _,
      """SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 4
        |ORDER BY l_orderkey""".stripMargin),
    OpDef("agg_groupby", aggGroupBy _,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    OpDef("agg_global", aggGlobal _,
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty,
        |  MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin),
    OpDef("agg_sum_flags", aggSumFlags _,
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM((o_totalprice > 100000.0)::INT) AS BIGINT) AS n_large,
        |  CAST(SUM((o_orderstatus = 'F')::INT) AS BIGINT) AS n_finished,
        |  CAST(SUM((o_orderdate IS NULL)::INT) AS BIGINT) AS n_null_date
        |FROM orders""".stripMargin),
    OpDef("agg_conditional", aggConditional _,
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        |  CAST(SUM(CASE WHEN l_quantity >= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
        |  CAST(SUM(CAST(CASE WHEN l_discount >= 0.05 THEN l_extendedprice ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS discounted_value
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    OpDef("agg_avg_case", aggAvgCase _,
      """SELECT o_orderpriority,
        |  CAST(FLOOR((CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE)
        |    / COUNT(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 100 + 0.5) AS DOUBLE) / 100 AS avg_finished_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    OpDef("agg_rate", aggRate _,
      """SELECT o_orderpriority, COUNT(*) AS total_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
        |  CAST(FLOOR((1.0 * SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0)) * 10000 + 0.5) AS DOUBLE) / 10000 AS finish_rate
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    OpDef("distinct", distinctOp _,
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    OpDef("agg_array_collect", aggArrayCollect _,
      """SELECT n_regionkey,
        |  array_to_string(array_agg(n_name ORDER BY n_name), '|') AS nation_names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),
    OpDef("scalar_subquery", scalarSubquery _,
      """SELECT o_orderpriority,
        |  CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) * 100 + 0.5) AS DOUBLE) / 100 AS priority_value,
        |  CAST(FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
        |    / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) FROM orders)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS value_share
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    OpDef("agg_count_distinct", aggCountDistinct _,
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    OpDef("agg_rollup", aggRollup _,
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
        |  CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderstatus) AS INT) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        |FROM orders WHERE o_orderdate IS NOT NULL
        |GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
        |ORDER BY gid, yr NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin),
    OpDef("agg_cube", aggCube _,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    OpDef("agg_stats_moments", aggStatsMoments _,
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  CAST(FLOOR((sx / n) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS mean_qty,
        |  CAST(FLOOR(((sxx - sx * sx / n) / NULLIF(n - 1, 0)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS var_qty,
        |  CAST(FLOOR(((n * sxy - sx * sy) /
        |    NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)) * 1000000 + 0.5)
        |    AS DOUBLE) / 1000000 AS corr_qty_price
        |FROM m
        |ORDER BY l_returnflag""".stripMargin),
    OpDef("agg_grouping_sets", aggGroupingSets _,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
    OpDef("agg_histogram", aggHistogram _,
      """SELECT bucket, CAST(bucket * 30000.0 AS DOUBLE) AS lo, n_orders
        |FROM (
        |  SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19.0) AS INT) AS bucket,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1
        |)
        |ORDER BY bucket""".stripMargin),
    OpDef("agg_salted", aggSalted _,
      """SELECT l_orderkey,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING COUNT(*) >= 5
        |ORDER BY l_orderkey""".stripMargin),
    OpDef("agg_distinct_sketch", aggDistinctSketch _, distinctSketchOracle),
    OpDef("agg_countmin", aggCountMin _, countMinOracle),
    OpDef("sketch_rolling_distinct", sketchRollingDistinct _, sketchRollingOracle),
    OpDef("agg_approx_distinct", aggApproxDistinct _,
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    OpDef("agg_approx_percentile", aggApproxPercentile _,
      """SELECT l_returnflag,
        |  CAST(FLOOR(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) AS DOUBLE) / 10000 AS p50_exact,
        |  TRUE AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    OpDef("agg_percentile", aggPercentile _,
      """SELECT l_returnflag,
        |  CAST(FLOOR(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) AS DOUBLE) / 10000 AS p25,
        |  CAST(FLOOR(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) AS DOUBLE) / 10000 AS p50,
        |  CAST(FLOOR(quantile_cont(l_extendedprice, 0.9) * 10000 + 0.5) AS DOUBLE) / 10000 AS p90
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  )

  /** Rollup (non-reference extra): per-(year, status) subtotals, year
    * totals, and the grand total in one pass — Spark expands the
    * grouping sets before the same single hash-aggregate shuffle.
    * `grouping_id` disambiguates structural NULLs; ordering pins NULLS
    * FIRST explicitly because the engines' defaults differ. */
  private def aggRollup(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderdate".isNotNull)
      .rollup(year($"o_orderdate").as("yr"), $"o_orderstatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(27,6)")).cast("double")
          .as("total_value"))
      .select($"yr".cast("int").as("yr"), $"o_orderstatus", $"gid",
        $"n_orders", $"total_value")
      .orderBy($"gid".asc, $"yr".asc_nulls_first,
        $"o_orderstatus".asc_nulls_first)
  }

  /** Cube (non-reference extra): all four grouping sets of
    * (returnflag, linestatus) in one pass — like [[aggRollup]] but the
    * full lattice; same single hash-aggregate shuffle after grouping-
    * set expansion, `grouping_id` disambiguation, NULLS FIRST pinned. */
  /** Statistical moments per group — mean, sample variance, and the
    * quantity↔price correlation — derived from DECIMAL-EXACT power
    * sums (Σx, Σx², Σy², Σxy) instead of the engines' native
    * `corr`/`stddev` aggregates, whose streaming/pairwise float
    * algorithms are combine-order-dependent and NEVER hash-match
    * across engines. Per-row products are IEEE-identical in both
    * engines, the sums are exact, and every derived statistic is then
    * arithmetic on identical doubles — deterministic under any
    * partitioning, which is also what makes it safe on a 1000-executor
    * cluster. One map-side-combined aggregation, one scan. */
  private def aggStatsMoments(s: SparkSession, d: String) = {
    import s.implicits._
    val dec = "decimal(38,6)"
    Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_quantity".as("x"), $"l_extendedprice".as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).cast("double").as("sx"),
        sum($"y".cast(dec)).cast("double").as("sy"),
        sum(($"x" * $"x").cast(dec)).cast("double").as("sxx"),
        sum(($"y" * $"y").cast(dec)).cast("double").as("syy"),
        sum(($"x" * $"y").cast(dec)).cast("double").as("sxy"))
      // NULLIF guards on n-1 and the corr denominator: on an n=1 or
      // constant-valued group Spark's double division-by-zero yields
      // NULL while DuckDB (ieee_floating_point_ops) yields inf/NaN —
      // guarding IDENTICALLY in both engines makes degenerate groups
      // agree by construction (both emit NULL)
      .select($"l_returnflag", $"n",
        roundHalfUp($"sx" / $"n", 6).as("mean_qty"),
        roundHalfUp(($"sxx" - $"sx" * $"sx" / $"n") / nullif($"n" - 1, lit(0)), 6)
          .as("var_qty"),
        roundHalfUp(($"n" * $"sxy" - $"sx" * $"sy") /
          nullif(sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), lit(0.0)), 6).as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** Arbitrary GROUPING SETS — the non-hierarchical shape neither
    * ROLLUP nor CUBE expresses: two independent one-column groupings
    * ((returnflag), (linestatus)) computed in one pass over the fact
    * (Spark expands to a single Expand + hash aggregate — one scan,
    * one shuffle, map-side combined, exactly like rollup/cube). */
  private def aggGroupingSets(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupingSets(Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_lines"),
        sumExact($"l_quantity").as("sum_qty"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"n_lines", $"sum_qty")
      .orderBy($"gid".asc, $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
  }

  private def aggCube(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_lines"),
        sumExact($"l_quantity").as("sum_qty"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"n_lines", $"sum_qty")
      .orderBy($"gid".asc, $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
  }

  /** Fixed-width histogram (non-reference extra): 20 buckets of order
    * value — one map-side-combined aggregation on the bucket id, the
    * exact-count histogram shape (approximate sketches would replace
    * the groupBy with a mergeable state at extreme cardinality). */
  private def aggHistogram(s: SparkSession, d: String) = {
    import s.implicits._
    val w = 30000.0
    Tables.orders(s, d)
      .select(least(floor($"o_totalprice" / w), lit(19.0)).cast("int").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"))
      .select($"bucket", ($"bucket" * w).cast("double").as("lo"), $"n_orders")
      .orderBy($"bucket")
  }

  /** Salted two-phase aggregation (non-reference extra): the skew
    * pattern for hot keys — spread each key over 8 salt buckets,
    * partial-aggregate per (key, salt), then merge per key. The salt
    * only changes WHERE partial states live, never the result (decimal
    * accumulation keeps the two-phase sum exactly equal to the direct
    * one), so the oracle is the plain aggregation. Spark's own
    * map-side combine handles moderate skew; explicit salting is the
    * escape hatch when one key exceeds a single reducer. */
  private def aggSalted(s: SparkSession, d: String) = {
    import s.implicits._
    val partial = Tables.lineitem(s, d)
      .groupBy($"l_orderkey", ($"l_linenumber" % 8).as("salt"))
      .agg(count(lit(1)).as("c"),
        sum($"l_quantity".cast("decimal(27,6)")).as("q"))
    partial.groupBy($"l_orderkey")
      .agg(sum($"c").cast("long").as("n_lines"),
        sum($"q").cast("double").as("sum_qty"))
      .filter($"n_lines" >= 5)
      .orderBy($"l_orderkey")
  }

  /** Exact interpolated percentiles (non-reference extra): Spark's
    * `percentile` and DuckDB's `quantile_cont` both rank at (n-1)·p
    * with linear interpolation; half-up rounding to 4dp absorbs any
    * last-bit formula difference.
    *
    * SCALE BOUND — this is the bounded-group EXACT variant: `percentile`
    * buffers every group's values in executor memory (N/groups doubles
    * per group), which is fine while groups are bounded (3 return flags
    * here) and an OOM when they are not. For unbounded groups at 100 TB
    * reach for [[aggApproxPercentile]] — constant sketch memory per
    * group, rank error ≤ 1/accuracy. */
  private def aggPercentile(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.25)").as("r25"),
        expr("percentile(l_extendedprice, 0.5)").as("r50"),
        expr("percentile(l_extendedprice, 0.9)").as("r90"))
      .select($"l_returnflag",
        roundHalfUp($"r25", 4).as("p25"),
        roundHalfUp($"r50", 4).as("p50"),
        roundHalfUp($"r90", 4).as("p90"))
      .orderBy($"l_returnflag")
  }

  /** Relative-error bound for the HLL distinct sketch: the sketch is
    * built with rsd 0.02, and the oracle-checked claim is |approx −
    * exact| ≤ 5 % · exact — ~2.5 standard deviations of slack, tight
    * enough to be meaningful, loose enough to never flap. Sketch
    * hashes differ across engines, so the APPROX VALUE itself cannot
    * hash-match a DuckDB oracle; what can is the exact count plus the
    * bounded-error CLAIM as a boolean — DuckDB asserts `TRUE`, and the
    * row hash-matches iff Spark's sketch really landed in the bound. */
  private val HllBound = 0.05

  /** Value-relative bound for the percentile sketch: accuracy 10000
    * caps RANK error at n/10000; on the testdata price distribution
    * that is far below 0.5 % of the median VALUE (spec-asserted at
    * sf0.01 and sf0.1). */
  private val PctBound = 0.005

  /** [EXT] Sketch distinct count — the operator a 100 TB pipeline
    * reaches for FIRST: `approx_count_distinct` (HyperLogLog++) keeps a
    * fixed ~KB register set per group instead of a hash set of every
    * key, so memory is O(groups), not O(distinct keys). The exact twin
    * is computed alongside purely as the oracle anchor (see
    * [[HllBound]]); a production job would drop it. */
  /** [EXT] MERGEABLE distinct-count sketch, fully deterministic —
    * linear probabilistic counting over md5-derived buckets: per
    * group, a [[LcM]]-bit register file (as [[LcWords]] OR-able
    * BIGINT words), estimate −m·ln(empty/m), reported against the
    * exact recount with relative error. Unlike `approx_count_distinct`
    * (whose HLL is engine-private, oracle-checkable only as a bound),
    * every bit here is reproducible in SQL — the oracle verifies the
    * REGISTERS, not just the estimate.
    *
    * Scale: this is the pre-aggregation pattern for distinct counts —
    * the sketch shuffle carries ≤ groups × 16 longs no matter how
    * many rows scan (bit_or combines map-side), and stored per-day
    * registers merge by OR for any date range without rescanning
    * (the mergeability `COUNT(DISTINCT)` fundamentally lacks). The
    * exact-recount branch is the verification harness, priced
    * honestly like `text_heavy_hitters`' recount. */
  /** Spec hook: the per-(group, word) register file over an arbitrary
    * (event_type, user_id) frame — the mergeable state itself, so
    * tests can assert OR-merge semantics across splits. */
  private[graft] def lcRegisters(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df
      .select($"event_type",
        (hash60(concat(lit("lc:"), $"user_id".cast("string"))) % LcM).as("b"))
      .select($"event_type", expr(s"b div $LcBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(b % $LcBits as int))")
          .as("bit"))
      .groupBy($"event_type", $"word")
      .agg(expr("bit_or(bit)").as("w"))
  }

  private def aggDistinctSketch(s: SparkSession, d: String) = {
    import s.implicits._
    val m = LcM
    val words = lcRegisters(Tables.events(s, d))
    val sk = words.groupBy($"event_type")
      .agg(sum(bit_count($"w")).cast("long").as("filled"))
    val exact = Tables.events(s, d).groupBy($"event_type")
      .agg(count_distinct($"user_id").as("exact_users"))
    sk.join(broadcast(exact), "event_type")
      .withColumn("est_users", roundHalfUp(
        lit(-1.0) * m * log(
          nullif(lit(m.toDouble) - $"filled", lit(0.0)) / m), 4))
      .select($"event_type", lit(m).cast("long").as("m"), $"filled",
        $"est_users", $"exact_users",
        roundHalfUp(abs($"est_users" - $"exact_users") / $"exact_users", 4)
          .as("rel_err"))
      .orderBy($"event_type")
  }

  private def distinctSketchOracle: String =
    s"""WITH b AS (
       |  SELECT event_type,
       |    ${hash60Sql("'lc:' || user_id")} % $LcM AS b
       |  FROM events
       |),
       |w AS (
       |  SELECT event_type, b // $LcBits AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(b % $LcBits AS INT)) AS w
       |  FROM b GROUP BY 1, 2
       |),
       |sk AS (
       |  SELECT event_type, CAST(SUM(bit_count(w)) AS BIGINT) AS filled
       |  FROM w GROUP BY 1
       |),
       |ex AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY 1
       |),
       |est AS (
       |  SELECT s.event_type, s.filled, e.exact_users,
       |    ${roundHalfUpSql(
          s"-1.0 * $LcM * ln(NULLIF($LcM.0 - s.filled, 0.0) / $LcM)", 4)}
       |      AS est_users
       |  FROM sk s JOIN ex e ON e.event_type = s.event_type
       |)
       |SELECT event_type, CAST($LcM AS BIGINT) AS m, filled, est_users,
       |  exact_users,
       |  ${roundHalfUpSql("ABS(est_users - exact_users) / exact_users", 4)}
       |    AS rel_err
       |FROM est
       |ORDER BY event_type""".stripMargin

  /** [EXT] MERGEABLE count-min sketch — the frequency twin of
    * [[aggDistinctSketch]]: per-key counts folded into a fixed
    * [[CmDepth]]×[[CmWidth]] counter grid (row i's counter =
    * `hash60(i, key) % width`), point-estimate = MIN across rows.
    * Estimates only ever OVERcount (collisions add, min can't
    * undershoot), so `cms_est ≥ exact` is an invariant the spec pins.
    *
    * Scale: the sketch shuffle carries ≤ depth×width counters no
    * matter how many rows scan (counts combine map-side; cells SUM
    * across shards or time windows, which is the mergeability
    * `GROUP BY key` lacks when the key space itself won't fit). The
    * exact-count branch exists purely as the verification anchor,
    * priced honestly like the sketch family's other recounts; its
    * top-K head is `orderBy(...).limit(K)` → TakeOrderedAndProject
    * (partition-local heads, driver merge of P×K rows — never a
    * single-partition sort of the key space), and `rn` is then a
    * strict-predecessor count over a broadcast self-pairing of that
    * K-row head (K² comparisons on a constant frame), so the plan
    * carries NO partition-less Window. Deterministic: all [[CmDepth]] hash rows
    * slice DISJOINT 10-hex-digit (40-bit) windows of ONE md5 per key —
    * one hash computation per row instead of depth, bit-identical
    * counters in both engines, no seed/partition dependence. */
  private def aggCountMin(s: SparkSession, d: String) = {
    import s.implicits._
    val k = $"l_partkey".cast("string")
    def probes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", md5(k))
      .select(df.columns.map(col) :+ posexplode(array(
        (1 to CmDepth).map(i =>
          conv(substring($"h", 1 + 10 * (i - 1), 10), 16, 10)
            .cast("long") % CmWidth): _*)): _*)
      .withColumnRenamed("pos", "dep").withColumnRenamed("col", "bucket")
    val li = Tables.lineitem(s, d).select($"l_partkey")
    val sketch = probes(li)
      .groupBy($"dep", $"bucket").agg(count(lit(1)).as("c"))
    val exact = li.groupBy($"l_partkey").agg(count(lit(1)).as("exact_cnt"))
    // cached so the broadcast self-pairing below replays the 10-row
    // head, not the full key-space aggregate, a second time
    val top = exact
      .orderBy($"exact_cnt".desc, $"l_partkey".asc).limit(CmTopK).cache()
    val topk = top.as("a")
      .join(broadcast(top.select(
        $"l_partkey".as("pk"), $"exact_cnt".as("pc"))),
        $"pc" > $"exact_cnt" ||
          ($"pc" === $"exact_cnt" && $"pk" < $"l_partkey"), "left")
      .groupBy($"l_partkey", $"exact_cnt")
      .agg((count($"pk") + 1).cast("int").as("rn"))
    probes(topk)
      .join(broadcast(sketch), Seq("dep", "bucket"))
      .groupBy($"l_partkey", $"exact_cnt", $"rn")
      .agg(min($"c").as("cms_est"))
      .select($"rn", $"l_partkey", $"exact_cnt", $"cms_est",
        ($"cms_est" - $"exact_cnt").as("overcount"))
      .orderBy($"rn")
  }

  private def countMinOracle: String = {
    def bucketSql(i: Int) =
      s"CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), " +
        s"${1 + 10 * (i - 1)}, 10)) AS BIGINT) % $CmWidth"
    val rowProbes = (1 to CmDepth).map(i =>
      s"SELECT ${i - 1} AS dep, ${bucketSql(i)} AS bucket FROM lineitem")
      .mkString("\n  UNION ALL ")
    val keyProbes = (1 to CmDepth).map(i =>
      s"SELECT rn, l_partkey, exact_cnt, ${i - 1} AS dep, ${bucketSql(i)} AS bucket FROM topk")
      .mkString("\n  UNION ALL ")
    s"""WITH rowprobes AS (
       |  $rowProbes
       |),
       |sketch AS (
       |  SELECT dep, bucket, COUNT(*) AS c FROM rowprobes GROUP BY 1, 2
       |),
       |exact AS (
       |  SELECT l_partkey, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1
       |),
       |topk AS (
       |  SELECT * FROM (
       |    SELECT l_partkey, exact_cnt, CAST(ROW_NUMBER() OVER (
       |      ORDER BY exact_cnt DESC, l_partkey ASC) AS INT) AS rn
       |    FROM exact
       |  ) WHERE rn <= $CmTopK
       |),
       |keyprobes AS (
       |  $keyProbes
       |)
       |SELECT p.rn, p.l_partkey, p.exact_cnt, MIN(s.c) AS cms_est,
       |  MIN(s.c) - p.exact_cnt AS overcount
       |FROM keyprobes p
       |JOIN sketch s ON s.dep = p.dep AND s.bucket = p.bucket
       |GROUP BY p.rn, p.l_partkey, p.exact_cnt
       |ORDER BY p.rn""".stripMargin
  }

  /** [EXT] Daily-sketch ROLLUP — the reason mergeable sketches exist:
    * materialize one [[LcM]]-bit register file PER DAY (the only thing
    * a 100 TB pipeline stores), then answer "distinct users over any
    * trailing 7-day range" by OR-merging the stored registers — the
    * raw events are never rescanned. This is the sketch twin of
    * `window_rolling_distinct`'s exact ×7 contribution explode, at
    * O(days × registers) instead of O(distinct-pairs × 7).
    *
    * Scale: the per-day registers build in one map-side-combined
    * shuffle (≤ days × [[LcWords]] longs); the dense day×word spine is
    * metadata-sized (like `timeseries_fill`'s); the rolling OR is a
    * RANGE window over integer day numbers PARTITIONED BY WORD — gaps
    * in the calendar handled by the frame, state per partition ≤ 7
    * longs. The exact recount rides along purely as the verification
    * anchor. Registers are md5-derived → bit-identical engines.
    *
    * Parameter honesty, PRODUCTION GEOMETRY: linear counting saturates
    * once every bit is set (est → NULL) — the fixed 960-bit demo
    * geometry did exactly that at the 10× rehearsal (measured, round
    * 9). So m is now a deterministic function of the data, the
    * `ann_ivf_incremental` √N-policy move: m = [[LcScale]]× the
    * corpus-wide distinct-user count (an upper bound on any 7-day
    * window's cardinality), rounded up to whole [[LcBits]]-bit words,
    * floored at the demo geometry. At load t = n/m ≤ 1/[[LcScale]]
    * the LC relative error is ≈ √(e^t − t − 1)/(t·√m) ≲ 1 % at
    * testdata scale and SHRINKS as n grows — m ≈ n/ln n is merely the
    * never-saturate bound, several orders too small for bounded error.
    * Both engines derive the SAME m (one scalar job / a scalar
    * subquery); register storage stays O(days × m/60 longs) — at
    * n = 10⁹ users/day that is ~8 MB/day of longs, still nothing. */
  private def sketchRollingDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct().cache()
    val m = math.max(LcM.toLong,
      LcBits * math.ceil(
        LcScale.toDouble * ud.select($"user_id").distinct().count()
          / LcBits).toLong)
    val mWords = m / LcBits
    val regs = ud
      .select($"day",
        (hash60(concat(lit("lc:"), $"user_id".cast("string"))) % m).as("b"))
      .select($"day", expr(s"b div $LcBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(b % $LcBits as int))")
          .as("bit"))
      .groupBy($"day", $"word")
      .agg(expr("bit_or(bit)").as("w"))
    val spine = ud.select($"day").distinct()
      .select($"day", explode(expr(
        s"sequence(cast(0 as bigint), cast(${mWords - 1} as bigint))"))
        .as("word"))
    val byWord = Window.partitionBy($"word")
      .orderBy($"daynum").rangeBetween(-6, 0)
    val rolled = spine.join(regs, Seq("day", "word"), "left")
      .withColumn("daynum", datediff($"day", to_date(lit("1970-01-01"))))
      .withColumn("rw", expr("bit_or(coalesce(w, 0))").over(byWord))
    val est = rolled.groupBy($"day")
      .agg(sum(bit_count($"rw")).cast("long").as("filled"))
    val exact = ud
      .select($"user_id",
        explode(expr("sequence(day, date_add(day, 6))")).as("win_end"))
      .groupBy($"win_end")
      .agg(count_distinct($"user_id").as("exact_users_7d"))
    est.join(exact, est("day") === exact("win_end"))
      .withColumn("est_users_7d", roundHalfUp(
        lit(-1.0) * m * log(
          nullif(lit(m.toDouble) - $"filled", lit(0.0)) / m), 4))
      .select($"day", $"filled", $"est_users_7d", $"exact_users_7d",
        roundHalfUp(abs($"est_users_7d" - $"exact_users_7d") /
          $"exact_users_7d", 4).as("rel_err"))
      .orderBy($"day")
  }

  private def sketchRollingOracle: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
       |),
       |msel AS (
       |  SELECT GREATEST($LcM, $LcBits * CAST(CEIL(
       |    $LcScale.0 * COUNT(DISTINCT user_id) / $LcBits) AS BIGINT)) AS m
       |  FROM ud
       |),
       |regs AS (
       |  SELECT day, b // $LcBits AS word,
       |    bit_or(CAST(1 AS BIGINT) << CAST(b % $LcBits AS INT)) AS w
       |  FROM (
       |    SELECT day, ${hash60Sql("'lc:' || user_id")} % (SELECT m FROM msel) AS b
       |    FROM ud
       |  ) GROUP BY 1, 2
       |),
       |spine AS (
       |  SELECT d.day, g.word
       |  FROM (SELECT DISTINCT day FROM ud) d
       |  CROSS JOIN (SELECT CAST(i AS BIGINT) AS word
       |              FROM range(0, 1048576) t(i)
       |              WHERE i < (SELECT m FROM msel) // $LcBits) g
       |),
       |rolled AS (
       |  SELECT s.day,
       |    bit_or(COALESCE(r.w, 0)) OVER (PARTITION BY s.word
       |      ORDER BY s.day - DATE '1970-01-01'
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rw
       |  FROM spine s LEFT JOIN regs r ON r.day = s.day AND r.word = s.word
       |),
       |est AS (
       |  SELECT day, CAST(SUM(bit_count(rw)) AS BIGINT) AS filled
       |  FROM rolled GROUP BY 1
       |),
       |exact AS (
       |  SELECT win_end, COUNT(DISTINCT user_id) AS exact_users_7d
       |  FROM (SELECT user_id, day + CAST(i AS INT) AS win_end
       |        FROM ud CROSS JOIN range(0, 7) t(i))
       |  GROUP BY 1
       |),
       |joined AS (
       |  SELECT e.day, e.filled, x.exact_users_7d,
       |    ${roundHalfUpSql(
        "-1.0 * mm.m * ln(NULLIF(CAST(mm.m AS DOUBLE) - e.filled, 0.0) / mm.m)",
        4)}
       |      AS est_users_7d
       |  FROM est e JOIN exact x ON x.win_end = e.day
       |  CROSS JOIN msel mm
       |)
       |SELECT day, filled, est_users_7d, exact_users_7d,
       |  ${roundHalfUpSql(
        "ABS(est_users_7d - exact_users_7d) / exact_users_7d", 4)} AS rel_err
       |FROM joined
       |ORDER BY day""".stripMargin

  private def aggApproxDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx_parts" - $"exact_parts") <=
          $"exact_parts" * HllBound).as("within_bound"))
      .orderBy($"l_returnflag")
  }

  /** [EXT] Sketch percentile — the unbounded-group twin of
    * [[aggPercentile]]: `approx_percentile` (a mergeable quantile
    * sketch) holds O(accuracy) values per group regardless of group
    * size. Oracle pattern as [[aggApproxDistinct]]: exact median +
    * bounded-error claim (see [[PctBound]]). */
  private def aggApproxPercentile(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact50"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx50"))
      .select($"l_returnflag",
        roundHalfUp($"exact50", 4).as("p50_exact"),
        (abs($"approx50" - $"exact50") <=
          abs($"exact50") * PctBound).as("within_bound"))
      .orderBy($"l_returnflag")
  }

  /** [EXT] Weighted median — the 50% point of the l_quantity-weighted
    * l_extendedprice distribution per return flag (plain `percentile`
    * cannot weight rows). Algorithm: collapse to DISTINCT values with
    * exact decimal weight sums, then one per-group cumulative-weight
    * window picks the smallest value whose cumulative weight reaches
    * half the total.
    *
    * Scale: the collapse shuffles (group, value) pairs — bounded by
    * the value domain, not the row count — and the window runs over
    * those collapsed rows only; raw rows never sort. Ties in the
    * crossing condition are impossible by construction (cum is summed
    * over DISTINCT values in value order — no row order ambiguity),
    * and decimal weights make the 2·cum ≥ tot comparison exact in
    * both engines. */
  private def aggWeightedMedian(s: SparkSession, d: String) = {
    import s.implicits._
    val byVal = Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_extendedprice")
      .agg(sum($"l_quantity".cast("decimal(27,6)")).as("w"))
    val wCum = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy($"l_returnflag")
    byVal
      .withColumn("cum", sum($"w").over(wCum))
      .withColumn("tot", sum($"w").over(wTot))
      .filter($"cum" * 2 >= $"tot")
      .groupBy($"l_returnflag")
      .agg(min($"l_extendedprice").as("weighted_median"),
        max($"tot").cast("double").as("total_weight"))
      .orderBy($"l_returnflag")
  }

  private def weightedMedianOracle: String =
    """WITH v AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    SUM(CAST(l_quantity AS DECIMAL(27,6))) AS w
      |  FROM lineitem GROUP BY 1, 2
      |),
      |c AS (
      |  SELECT l_returnflag, l_extendedprice, w,
      |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM v
      |)
      |SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median,
      |  CAST(MAX(tot) AS DOUBLE) AS total_weight
      |FROM c
      |WHERE cum * 2 >= tot
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** [EXT] Per-group OLS fit (slope, intercept, r²) of extended price
    * on quantity — regression by SUFFICIENT STATISTICS: six decimal
    * accumulators (n, Σx, Σy, Σxy, Σx², Σy²) in one map-side-combined
    * pass, closed-form solve on the per-group summary row.
    *
    * Scale: this is how regression runs at 100 TB — the shuffle
    * carries six numbers per group no matter how many rows scan, and
    * decimal accumulation makes the sums order-free (a double sum
    * would drift run-to-run at 1000 executors). The closed-form
    * arithmetic then runs on identical doubles in both engines
    * (products are quantized to decimal at the row BEFORE summing);
    * degenerate groups (constant x or y) yield NULL via the shared
    * NULLIF guard instead of engine-dependent inf/NaN. */
  private def aggLinearFit(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum($"l_quantity".cast("decimal(27,6)")).cast("double").as("sx"),
        sum($"l_extendedprice".cast("decimal(27,6)")).cast("double").as("sy"),
        sum(($"l_quantity" * $"l_extendedprice").cast("decimal(27,6)"))
          .cast("double").as("sxy"),
        sum(($"l_quantity" * $"l_quantity").cast("decimal(27,6)"))
          .cast("double").as("sxx"),
        sum(($"l_extendedprice" * $"l_extendedprice").cast("decimal(27,6)"))
          .cast("double").as("syy"))
      .withColumn("dxy", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("dxx", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("dyy", $"n" * $"syy" - $"sy" * $"sy")
      .select($"l_returnflag", $"n".cast("long").as("n_rows"),
        roundHalfUp($"dxy" / nullif($"dxx", lit(0.0)), 6).as("slope"),
        roundHalfUp(
          ($"sy" - ($"dxy" / nullif($"dxx", lit(0.0))) * $"sx") / $"n", 6)
          .as("intercept"),
        roundHalfUp(
          $"dxy" * $"dxy" / nullif($"dxx" * $"dyy", lit(0.0)), 6).as("r2"))
      .orderBy($"l_returnflag")
  }

  private def linearFitOracle: String =
    s"""WITH g AS (
       |  SELECT l_returnflag,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(27,6)))
       |      AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,6)))
       |      AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(27,6)))
       |      AS DOUBLE) AS syy
       |  FROM lineitem GROUP BY 1
       |),
       |d AS (
       |  SELECT l_returnflag, n, sx, sy,
       |    n * sxy - sx * sy AS dxy,
       |    n * sxx - sx * sx AS dxx,
       |    n * syy - sy * sy AS dyy
       |  FROM g
       |)
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       |  ${roundHalfUpSql("dxy / NULLIF(dxx, 0.0)", 6)} AS slope,
       |  ${roundHalfUpSql(
          "(sy - (dxy / NULLIF(dxx, 0.0)) * sx) / n", 6)} AS intercept,
       |  ${roundHalfUpSql(
          "dxy * dxy / NULLIF(dxx * dyy, 0.0)", 6)} AS r2
       |FROM d
       |ORDER BY l_returnflag""".stripMargin
}
