package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Scalar-function showcases — SURVEY §2.7 (F1-F19).
  *
  * Dialect-parity notes carried from SURVEY §7.4:
  *  - F3: DuckDB `regexp_replace` is first-match unless flagged `'g'`;
  *    the engine op is replace-all, so the oracle SQL carries `'g'`.
  *  - F12: month-diff counts month-boundary crossings (DuckDB
  *    `date_diff('month', …)`), NOT Spark's fractional `months_between`
  *    — implemented as integer year*12+month arithmetic.
  *  - Rounding uses [[graft.functions.Exact.roundHalfUp]] on both sides.
  */
object Scalars {

  /** F1/F2 — lower/trim/upper string normalization
    * (reference `pipeline.py:133,143`). */
  private def fnString(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.customer(s, d)
      .select(
        $"c_custkey",
        lower($"c_name").as("name_lower"),
        upper($"c_mktsegment").as("segment_upper"),
        trim(lit("  padded  ")).as("trimmed"),
        concat($"c_name", lit("@"), $"c_mktsegment").as("joined"))
      .orderBy($"c_custkey")
  }

  /** F3 — regex replace-all (reference `pipeline.py:133`, whitespace
    * strip on email; dialect caveat above). */
  private def fnRegexReplace(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.part(s, d)
      .select(
        $"p_partkey",
        regexp_replace($"p_name", "\\s+", "_").as("name_snake"),
        regexp_replace($"p_type", "[AEIOU]", "").as("type_novowel"))
      .orderBy($"p_partkey")
  }

  /** F5 — TRY_CAST lenient typing: malformed values → NULL, not error
    * (reference `pipeline.py:136-141`). */
  private def fnTryCast(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("priority_num"),
        expr("try_cast(o_orderstatus AS INT)").as("status_num"),
        expr("try_cast(o_orderpriority AS DOUBLE)").as("priority_dbl"))
      .orderBy($"o_orderkey")
  }

  /** F6 — CAST family: number→string, timestamp→date, bool→int
    * (reference `pipeline.py:396-419` flag::INT). */
  private def fnCast(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        $"o_orderkey".cast("string").as("key_str"),
        $"o_orderdate".cast("date").as("order_date"),
        ($"o_totalprice" > 10000.0).cast("int").as("is_large"))
      .orderBy($"o_orderkey")
  }

  /** F7 — fixed-point rounding (reference `queries.sql:50,59,68`). */
  private def fnRound(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        roundHalfUp($"o_totalprice" / lit(3.0), 2).as("third_2dp"),
        roundHalfUp($"o_totalprice" / lit(7.0), 4).as("seventh_4dp"))
      .orderBy($"o_orderkey")
  }

  /** F8/F9 — date_trunc to month and second (reference
    * `pipeline.py:202`, `queries.sql:29`). */
  private def fnDateTrunc(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .select(
        $"event_id",
        date_trunc("month", $"ts").as("ts_month"),
        date_trunc("day", $"ts").as("ts_day"),
        date_trunc("second", $"ts").as("ts_second"))
      .orderBy($"event_id")
  }

  /** F12 — month-diff as boundary crossings, DuckDB `date_diff('month')`
    * semantics (reference `pipeline.py:376-379`). */
  private def fnDateDiffMonth(s: SparkSession, d: String) = {
    import s.implicits._
    val anchor = lit(1998 * 12 + 12)
    Tables.orders(s, d)
      .select(
        $"o_orderkey", $"o_orderdate",
        (anchor - (year($"o_orderdate") * lit(12) + month($"o_orderdate")))
          .cast("long").as("months_to_anchor"))
      .orderBy($"o_orderkey")
  }

  /** F13/F14 — JSON-serialized map of booleans, the reference's
    * data_quality_flags pattern (reference `pipeline.py:179-200`). */
  private def fnToJsonMap(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        to_json(map(
          lit("large"), $"o_totalprice" > 100000.0,
          lit("finished"), $"o_orderstatus" === "F",
          lit("urgent"), $"o_orderpriority" === "1-URGENT"))
          .as("quality_flags"))
      .orderBy($"o_orderkey")
  }

  /** JSON path extraction — `get_json_object` over a JSON payload
    * column, the half-structured-ingest counterpart of [[fnToJsonMap]]
    * (non-reference extra; every log/event pipeline starts here). The
    * payload is assembled with `concat` from table columns so both
    * engines extract from byte-identical documents (serializer
    * whitespace/number formatting never enters the comparison); the
    * extracts are a top-level string, a nested path, and a numeric
    * path cast back to BIGINT. Scale: row-local, codegen'd, no
    * shuffle beyond the output sort. */
  private def fnJsonExtract(s: SparkSession, d: String) = {
    import s.implicits._
    val payload = concat(
      lit("{\"cust\":{\"id\":"), $"c_custkey",
      lit(",\"name\":\""), $"c_name",
      lit("\"},\"segment\":\""), $"c_mktsegment", lit("\"}"))
    Tables.customer(s, d)
      .select($"c_custkey", payload.as("payload"))
      .select(
        $"c_custkey",
        get_json_object($"payload", "$.segment").as("segment"),
        get_json_object($"payload", "$.cust.name").as("cust_name"),
        get_json_object($"payload", "$.cust.id").cast("long").as("cust_id"))
      .orderBy($"c_custkey")
  }

  /** Array-function surface — sort / dedup / slice / membership /
    * flatten-free length over the per-document token array, all
    * row-local codegen'd higher-order builtins (non-reference extra;
    * the list-column toolkit nested ingest relies on). Dialect parity:
    * DuckDB's `list_distinct` does not pin element order, so BOTH
    * engines sort after dedup (`sort_array(array_distinct(..))` vs
    * `list_sort(list_distinct(..))`) — set semantics, stable output.
    * Output discipline: the sliced prefix is emitted as a ','-joined
    * STRING (`array_join` / `array_to_string`) because the oracle
    * harness canonicalizes frames via pandas, which cannot sort
    * array-typed cells — see the OpDef conventions (no nested-typed
    * output columns). The op still exercises sort / dedup / slice /
    * membership; only the final rendering is flattened.
    * Scale: no shuffle beyond the output sort. */
  private def fnArray(s: SparkSession, d: String) = {
    import s.implicits._
    val toks = graft.functions.TextFns.tokens($"text")
    Tables.documents(s, d)
      .select($"doc_id", toks.as("toks"))
      .select(
        $"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_unique"),
        array_join(slice(sort_array(array_distinct($"toks")), 1, 3), ",")
          .as("first3_sorted"),
        array_contains($"toks", "the").as("has_the"))
      .orderBy($"doc_id")
  }

  /** Regex group extraction — `regexp_extract` with an explicit group
    * index, the parse-don't-split primitive for semi-structured
    * strings (non-reference extra). Pulls the numeric rank and the
    * word out of priorities like "1-URGENT"; no-match yields '' in
    * both engines with a group index present. Row-local codegen. */
  private def fnRegexExtract(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select(
        $"o_orderkey",
        regexp_extract($"o_orderpriority", "^(\\d+)-(.+)$", 1)
          .as("prio_rank"),
        regexp_extract($"o_orderpriority", "^(\\d+)-(.+)$", 2)
          .as("prio_word"))
      .orderBy($"o_orderkey")
  }

  /** Date-part extraction — year/quarter/month/day-of-week/day-of-year
    * (non-reference extra). Dialect parity pinned where engines
    * disagree on NUMBERING: Spark `dayofweek` is 1=Sunday while DuckDB
    * `dayofweek` is 0=Sunday — the engine subtracts 1 so both sides
    * speak the 0=Sunday convention. Row-local codegen. */
  private def fnDatePart(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_orderdate".isNotNull)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        quarter($"o_orderdate").cast("long").as("q"),
        month($"o_orderdate").cast("long").as("m"),
        (dayofweek($"o_orderdate") - 1).cast("long").as("dow_sun0"),
        dayofyear($"o_orderdate").cast("long").as("doy"))
      .orderBy($"o_orderkey")
  }

  /** F17 — NULLIF / COALESCE guards (reference `queries.sql:56`). */
  private def fnNullif(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(
        $"l_orderkey", $"l_linenumber",
        nullif($"l_discount", lit(0.0)).as("discount_or_null"),
        coalesce(nullif($"l_discount", lit(0.0)), lit(-1.0)).as("discount_coalesced"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** F10/F11 — timezone conversion + local-date anchor (reference
    * `pipeline.py:202,327,487` `CURRENT_TIMESTAMP AT TIME ZONE
    * 'Europe/Berlin'`, `pipeline.py:378` `CURRENT_DATE`). The
    * wall-clock form lives in [[graft.functions.Loan.processedAt]]
    * (nondeterministic, golden-excluded); THIS op proves the
    * conversion semantics deterministically: fixed event instants
    * UTC→Europe/Berlin via `from_utc_timestamp`, plus the Berlin
    * local DATE (shows the day-boundary shift for late-UTC events),
    * plus four pinned literals straddling BOTH 2024 DST transitions —
    * spring-forward (00:30Z→01:30 CET vs 01:30Z→03:30 CEST, the
    * skipped hour) and fall-back (00:30Z and 01:30Z BOTH →02:30, the
    * repeated hour) — so the op proves zone-rule application, not
    * just a fixed offset. Row-local codegen; no shuffle beyond the
    * output sort. */
  private def fnNowTz(s: SparkSession, d: String) = {
    import s.implicits._
    def berlin(c: org.apache.spark.sql.Column) =
      from_utc_timestamp(c, "Europe/Berlin")
    def pinned(utc: String) = berlin(lit(utc).cast("timestamp"))
    Tables.events(s, d)
      .select(
        $"event_id",
        berlin($"ts").as("ts_berlin"),
        to_date(berlin($"ts")).as("berlin_date"),
        pinned("2024-03-31 00:30:00").as("dst_spring_pre"),
        pinned("2024-03-31 01:30:00").as("dst_spring_post"),
        pinned("2024-10-27 00:30:00").as("dst_fall_pre"),
        pinned("2024-10-27 01:30:00").as("dst_fall_post"))
      .orderBy($"event_id")
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("fn_string", fnString _,
      """SELECT c_custkey,
        |  LOWER(c_name) AS name_lower,
        |  UPPER(c_mktsegment) AS segment_upper,
        |  TRIM('  padded  ') AS trimmed,
        |  c_name || '@' || c_mktsegment AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin),
    OpDef("fn_regex_replace", fnRegexReplace _,
      """SELECT p_partkey,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
        |  regexp_replace(p_type, '[AEIOU]', '', 'g') AS type_novowel
        |FROM part ORDER BY p_partkey""".stripMargin),
    OpDef("fn_try_cast", fnTryCast _,
      """SELECT o_orderkey,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_num,
        |  TRY_CAST(o_orderstatus AS INT) AS status_num,
        |  TRY_CAST(o_orderpriority AS DOUBLE) AS priority_dbl
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_cast", fnCast _,
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_totalprice > 10000.0 AS INT) AS is_large
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_round", fnRound _,
      """SELECT o_orderkey,
        |  CAST(FLOOR((o_totalprice / 3.0) * 100 + 0.5) AS DOUBLE) / 100 AS third_2dp,
        |  CAST(FLOOR((o_totalprice / 7.0) * 10000 + 0.5) AS DOUBLE) / 10000 AS seventh_4dp
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_date_trunc", fnDateTrunc _,
      """SELECT event_id,
        |  date_trunc('month', ts) AS ts_month,
        |  date_trunc('day', ts) AS ts_day,
        |  date_trunc('second', ts) AS ts_second
        |FROM events ORDER BY event_id""".stripMargin),
    OpDef("fn_date_diff_month", fnDateDiffMonth _,
      """SELECT o_orderkey, o_orderdate,
        |  CAST(date_diff('month', o_orderdate, TIMESTAMP '1998-12-01 00:00:00') AS BIGINT) AS months_to_anchor
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_to_json_map", fnToJsonMap _,
      """SELECT o_orderkey,
        |  to_json(map(
        |    ['large', 'finished', 'urgent'],
        |    [o_totalprice > 100000.0, o_orderstatus = 'F', o_orderpriority = '1-URGENT']
        |  )) AS quality_flags
        |FROM orders ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_array", fnArray _,
      s"""WITH toks AS (
         |  SELECT doc_id, ${graft.functions.TextFns.tokensSql("text")} AS t
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
         |  array_to_string(list_slice(list_sort(list_distinct(t)), 1, 3), ',') AS first3_sorted,
         |  list_contains(t, 'the') AS has_the
         |FROM toks
         |ORDER BY doc_id""".stripMargin),
    OpDef("fn_json_extract", fnJsonExtract _,
      """WITH docs AS (
        |  SELECT c_custkey,
        |    '{"cust":{"id":' || c_custkey || ',"name":"' || c_name ||
        |    '"},"segment":"' || c_mktsegment || '"}' AS payload
        |  FROM customer
        |)
        |SELECT c_custkey,
        |  payload ->> '$.segment' AS segment,
        |  payload ->> '$.cust.name' AS cust_name,
        |  CAST(payload ->> '$.cust.id' AS BIGINT) AS cust_id
        |FROM docs
        |ORDER BY c_custkey""".stripMargin),
    OpDef("fn_regex_extract", fnRegexExtract _,
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 1) AS prio_rank,
        |  regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 2) AS prio_word
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_date_part", fnDatePart _,
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
        |FROM orders WHERE o_orderdate IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin),
    OpDef("fn_nullif", fnNullif _,
      """SELECT l_orderkey, l_linenumber,
        |  NULLIF(l_discount, 0.0) AS discount_or_null,
        |  COALESCE(NULLIF(l_discount, 0.0), -1.0) AS discount_coalesced
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    OpDef("fn_now_tz", fnNowTz _,
      """SELECT event_id,
        |  (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS ts_berlin,
        |  CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS DATE) AS berlin_date,
        |  (TIMESTAMP '2024-03-31 00:30:00' AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS dst_spring_pre,
        |  (TIMESTAMP '2024-03-31 01:30:00' AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS dst_spring_post,
        |  (TIMESTAMP '2024-10-27 00:30:00' AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS dst_fall_pre,
        |  (TIMESTAMP '2024-10-27 01:30:00' AT TIME ZONE 'UTC') AT TIME ZONE 'Europe/Berlin' AS dst_fall_post
        |FROM events ORDER BY event_id""".stripMargin)
  )
}
