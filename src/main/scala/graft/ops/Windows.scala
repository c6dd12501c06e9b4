package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Window functions — SURVEY §2.5 (W1) plus ranking/lag/frame extras
  * the reference lacks but any user of the engine expects.
  *
  * Scale note: a window partitioned by a key is one shuffle on that
  * key; rows inside a partition sort in memory (spilling if needed).
  * Never use a global (`partitionBy()`-less) window at scale — every
  * query here partitions.
  */
object Windows {

  /** W1 — share-of-partition via unbounded window aggregate
    * (reference `queries.sql:206-245`, the monthly-volume-share query). */
  private def windowShare(s: SparkSession, d: String) = {
    import s.implicits._
    val monthly = Tables.orders(s, d)
      .filter($"o_orderdate".isNotNull)
      .groupBy(
        date_trunc("month", $"o_orderdate").as("cohort_month"),
        $"o_orderpriority")
      .agg(sumExactWhen($"o_orderstatus" === "F", $"o_totalprice")
        .as("finished_volume"))
    val w = Window.partitionBy($"cohort_month")
    monthly
      .select(
        $"cohort_month", $"o_orderpriority",
        roundHalfUp($"finished_volume", 2).as("finished_volume"),
        roundHalfUp(
          $"finished_volume" / nullif(sum($"finished_volume").over(w), lit(0.0)),
          4).as("monthly_share"))
      .orderBy($"cohort_month", $"o_orderpriority")
  }

  /** Ranking: top-3 orders per month by value, deterministic tie-break
    * (non-reference extra; Spark `row_number`). */
  private def windowRank(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window
      .partitionBy(date_trunc("month", $"o_orderdate"))
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .filter($"o_orderdate".isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select(date_trunc("month", $"o_orderdate").as("cohort_month"),
        $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"cohort_month", $"rn")
  }

  /** Lag: previous order value per customer (non-reference extra). */
  private def windowLag(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_totalprice"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Edge-of-partition values: first/last/2nd order price per customer
    * over the FULL partition frame — `last_value` silently defaults to
    * the running frame (unbounded-preceding..current-row) in both
    * engines, so the explicit unbounded-following frame is the whole
    * point of the demo. Total order (date, orderkey) keeps every
    * navigation deterministic (non-reference extra). */
  private def windowFirstLast(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        first($"o_totalprice").over(w).as("first_price"),
        last($"o_totalprice").over(w).as("last_price"),
        nth_value($"o_totalprice", 2).over(w).as("second_price"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Forward navigation: next order date + inter-order gap in days per
    * customer via `lead` — the mirror of [[windowLag]]; the gap column
    * is the raw material for churn/repeat-purchase features
    * (non-reference extra). */
  private def windowLead(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        lead($"o_orderdate", 1).over(w).as("next_orderdate"))
      .withColumn("days_to_next",
        datediff($"next_orderdate", $"o_orderdate").cast("long"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Running total per customer with an explicit rows frame
    * (non-reference extra; exact decimal accumulation keeps the prefix
    * sums reproducible). */
  private def windowRunning(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum($"o_totalprice".cast("decimal(27,6)")).over(w).cast("double")
          .as("running_value"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Quartile bucketing per market segment via `ntile(4)` over a
    * TOTAL order (balance, then custkey) — without the unique
    * tie-break, ntile's bucket boundaries would be partitioning-
    * dependent on equal balances (non-reference extra). */
  private def windowNtile(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        ntile(4).over(w).as("quartile"))
      .orderBy($"c_mktsegment", $"quartile", $"c_custkey")
  }

  /** Time-based RANGE frame: per-user trailing-1-hour event count and
    * exact value sum — the sliding-interval window `rowsBetween` can't
    * express (the frame is defined by the ORDER value, so ties and
    * irregular event spacing are handled by the semantics, not the row
    * position). Ordered by epoch micros (`unix_micros` ↔ DuckDB
    * `epoch_us` — the engines' shared integer time axis); one shuffle
    * on user_id like every partitioned window; DECIMAL value sums so
    * frame evaluation order cannot perturb totals. */
  /** Sliding event-time windows (1 h window, 15 min slide): each event
    * lands in window/slide = 4 overlapping buckets. Spark's `window()`
    * expands the 4 (win_start, row) assignments INSIDE the scan
    * project (a generator, row-local) and the aggregation map-side
    * combines per (window, type) — so the shuffle carries ≤ 4×groups
    * aggregate states, never 4× the data, and the same expression is
    * the streaming sliding-window form under a watermark. The oracle
    * mirrors the expansion with an explicit 4-offset cross join. */
  private def windowSliding(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sumExact($"value").as("total_value"))
      .select($"window.start".as("win_start"), $"event_type",
        $"n_events", $"total_value")
      .orderBy($"win_start", $"event_type")
  }

  private def windowRangeFrame(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tsu")
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("tsu"), $"value")
      .select($"user_id", $"event_id", $"tsu",
        count(lit(1)).over(w).as("n_trailing_1h"),
        sum($"value".cast("decimal(27,6)")).over(w).cast("double")
          .as("value_trailing_1h"))
      .orderBy($"user_id", $"tsu", $"event_id")
  }

  /** Distribution-position window functions: percent_rank + cume_dist
    * of each order's value within its month. The ordering key set is
    * unique (value, orderkey), so peer groups are singletons and both
    * statistics reduce to integer-ratio divisions — identical IEEE
    * doubles in any engine, quantized to 6 dp per the kit anyway. One
    * shuffle on the month, like every windowed op here. */
  private def windowCumeDist(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy(date_trunc("month", $"o_orderdate"))
      .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .filter($"o_orderdate".isNotNull)
      .select(date_trunc("month", $"o_orderdate").as("cohort_month"),
        $"o_orderkey", $"o_totalprice",
        roundHalfUp(percent_rank().over(w), 6).as("pct_rank"),
        roundHalfUp(cume_dist().over(w), 6).as("cume"))
      .orderBy($"cohort_month", $"o_orderkey")
  }

  /** Trailing 7-day DISTINCT active users per day — the rolling-
    * distinct feature a RANGE frame cannot express (COUNT(DISTINCT)
    * isn't a window aggregate in either engine). Implemented with the
    * contribution-explode trick: reduce to distinct (user, day) pairs,
    * explode each pair to the 7 window-end days it contributes to,
    * and count distinct users per window end — reported for days that
    * actually occur.
    *
    * Scale: the pair-distinct is one keyed shuffle that collapses raw
    * events to at most users × days rows; the ×7 explode amplifies
    * only those collapsed pairs (never raw events), and the per-day
    * distinct count is a second keyed shuffle. This shape stays flat
    * when events per user-day grow — the classic alternative (a range
    * self-join of days × events) re-scans event rows 7×. */
  private def windowRollingDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val counts = ud
      .select($"user_id",
        explode(expr("sequence(day, date_add(day, 6))")).as("win_end"))
      .groupBy($"win_end")
      .agg(count_distinct($"user_id").as("users_7d"))
    counts
      .join(ud.select($"day").distinct(), counts("win_end") === $"day")
      .select($"day", $"users_7d")
      .orderBy($"day")
  }

  /** Per-user exponentially weighted moving average over the trailing
    * 8 events (half-life decay 1/2 per step) — the smoothed-signal
    * feature behind rate limiting and anomaly scoring. A recursive
    * EWMA cannot ride a plain window aggregate (each row needs its own
    * distance-to-current weights), so the frame's values are collected
    * and folded row-locally.
    *
    * Cross-engine determinism: weights are 1/2^k (shift + divide —
    * EXACT powers of two, never `pow`'s libm), each weighted term is
    * quantized to 9 dp and summed as DECIMAL(27,18) (order-free), and
    * the denominator Σ1/2^k collapses to the closed form 2 − 2^−(n−1)
    * (exact). The oracle computes the identical terms via a bounded
    * self-join (its clearer SQL shape); both engines fold the same
    * decimal sum.
    *
    * Scale: one user-keyed shuffle; the collected frame is ≤ 8 doubles
    * per row, so the row-local fold adds constant work — against the
    * oracle's 8-way self-join shape this is the plan you want at
    * 100 TB (no second shuffle, no join amplification). */
  private def windowEwma(s: SparkSession, d: String) =
    ewmaOf(Tables.events(s, d))

  /** Spec hook: [[windowEwma]] over an arbitrary
    * (user_id, event_id, value) frame. */
  private[graft] def ewmaOf(events: org.apache.spark.sql.DataFrame) = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id".asc)
      .rowsBetween(-7, Window.currentRow)
    events
      .select($"user_id", $"event_id", $"value")
      .withColumn("vals", collect_list($"value").over(w))
      .withColumn("num", expr(
        """aggregate(
          |  zip_with(vals, sequence(size(vals) - 1, 0),
          |    (v, k) -> cast(floor((v / cast(shiftleft(1, k) as double))
          |      * 1000000000.0 + 0.5) as double) / 1000000000.0),
          |  cast(0 as decimal(27,18)),
          |  (acc, x) ->
          |    cast(acc + cast(x as decimal(27,18)) as decimal(27,18)))
          |""".stripMargin))
      .select($"user_id", $"event_id", $"value",
        roundHalfUp($"num".cast("double") /
          (lit(2.0) - lit(1.0) /
            expr("cast(shiftleft(1, size(vals) - 1) as double)")), 6)
          .as("ewma8"))
      .orderBy($"user_id", $"event_id")
  }

  private def ewmaOracle: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id ASC)
       |      AS rn
       |  FROM events
       |),
       |terms AS (
       |  SELECT c.user_id, c.event_id, c.value, c.rn,
       |    p.value AS pv, c.rn - p.rn AS k
       |  FROM e c JOIN e p
       |    ON p.user_id = c.user_id AND p.rn BETWEEN c.rn - 7 AND c.rn
       |),
       |agg AS (
       |  SELECT user_id, event_id, value, COUNT(*) AS n,
       |    SUM(CAST(${roundHalfUpSql(
          "pv / CAST(1 << CAST(k AS INT) AS DOUBLE)", 9)}
       |      AS DECIMAL(27,18))) AS num
       |  FROM terms GROUP BY user_id, event_id, value
       |)
       |SELECT user_id, event_id, value,
       |  ${roundHalfUpSql(
          "CAST(num AS DOUBLE) / " +
            "(2.0 - 1.0 / CAST(1 << CAST(n - 1 AS INT) AS DOUBLE))", 6)}
       |    AS ewma8
       |FROM agg
       |ORDER BY user_id, event_id""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("window_sliding", windowSliding _,
      """SELECT time_bucket(INTERVAL '15 minutes', ts)
        |    - k.k * INTERVAL '15 minutes' AS win_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
        |GROUP BY 1, 2
        |ORDER BY win_start, event_type""".stripMargin),
    OpDef("window_ewma", windowEwma _, ewmaOracle),
    OpDef("window_rolling_distinct", windowRollingDistinct _,
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |),
        |contrib AS (
        |  SELECT user_id, day + CAST(i AS INT) AS win_end
        |  FROM ud CROSS JOIN range(0, 7) t(i)
        |),
        |days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day, COUNT(DISTINCT c.user_id) AS users_7d
        |FROM contrib c JOIN days d ON c.win_end = d.day
        |GROUP BY d.day
        |ORDER BY d.day""".stripMargin),
    OpDef("window_cume_dist", windowCumeDist _,
      s"""SELECT date_trunc('month', o_orderdate) AS cohort_month,
         |  o_orderkey, o_totalprice,
         |  ${roundHalfUpSql("PERCENT_RANK() OVER w", 6)} AS pct_rank,
         |  ${roundHalfUpSql("CUME_DIST() OVER w", 6)} AS cume
         |FROM orders WHERE o_orderdate IS NOT NULL
         |WINDOW w AS (PARTITION BY date_trunc('month', o_orderdate)
         |             ORDER BY o_totalprice ASC, o_orderkey ASC)
         |ORDER BY cohort_month, o_orderkey""".stripMargin),
    OpDef("window_range_frame", windowRangeFrame _,
      """SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |  COUNT(*) OVER w AS n_trailing_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
        |    AS value_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, tsu, event_id""".stripMargin),
    OpDef("window_ntile", windowNtile _,
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS quartile
        |FROM customer
        |ORDER BY c_mktsegment, quartile, c_custkey""".stripMargin),
    OpDef("window_share", windowShare _,
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS cohort_month,
        |    o_orderpriority,
        |    CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE) AS finished_volume
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT cohort_month, o_orderpriority,
        |  CAST(FLOOR(finished_volume * 100 + 0.5) AS DOUBLE) / 100 AS finished_volume,
        |  CAST(FLOOR((finished_volume / NULLIF(SUM(finished_volume) OVER (PARTITION BY cohort_month), 0.0)) * 10000 + 0.5) AS DOUBLE) / 10000 AS monthly_share
        |FROM monthly
        |ORDER BY cohort_month, o_orderpriority""".stripMargin),
    OpDef("window_rank", windowRank _,
      """WITH ranked AS (
        |  SELECT date_trunc('month', o_orderdate) AS cohort_month,
        |    ROW_NUMBER() OVER (PARTITION BY date_trunc('month', o_orderdate)
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |    o_orderkey, o_totalprice
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |)
        |SELECT cohort_month, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice
        |FROM ranked WHERE rn <= 3
        |ORDER BY cohort_month, rn""".stripMargin),
    OpDef("window_first_last", windowFirstLast _,
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |  LAST_VALUE(o_totalprice) OVER w AS last_price,
        |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
    OpDef("window_lead", windowLead _,
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  LEAD(o_orderdate, 1) OVER w AS next_orderdate,
        |  date_diff('day', o_orderdate,
        |    LEAD(o_orderdate, 1) OVER w) AS days_to_next
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
    OpDef("window_lag", windowLag _,
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_totalprice
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),
    OpDef("window_running", windowRunning _,
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  )
}
