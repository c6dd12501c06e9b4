package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.pipeline.LoanPipeline

/** The SQL front door: the reference's own analytics queries
  * (`/root/reference/queries.sql:1-245`) run VERBATIM (after the
  * documented dialect swaps, SURVEY §7.4) through `spark.sql` against
  * the refdata-built loan portfolio — the engine exercised exactly the
  * way a user migrating off the reference would use it first: paste the
  * SQL, point it at the same tables.
  *
  * Input identity: [[ensureStaged]] builds `loan_portfolio` and
  * `data_quality_report` from the reference's own input CSVs
  * (src/main/resources/refdata, copies of /root/reference/data) via the
  * [[graft.pipeline.LoanPipeline]] DAG — whose outputs are proven
  * byte-for-value equal to the reference's goldens by
  * ReferenceGoldenSpec — and stages them once as parquet under
  * [[StageDir]]. Both engines then read the SAME files: Spark through
  * temp views, the DuckDB oracle through `read_parquet` CTEs injected
  * by [[oracleize]]. The query text itself is SHARED between the two
  * engines (one string, both dialects) except where a construct has no
  * common spelling (`explode` vs `unnest` in [[CuratedSpark]]).
  *
  * Dialect/determinism swaps, each mirrored identically on both sides
  * (so they cancel in the compare):
  *  - `ROUND(x, n)` → `FLOOR(x·10ⁿ + 0.5)/10ⁿ` ([[rnd]]): engines
  *    disagree on double rounding ties (Exact.roundHalfUp rationale).
  *  - money SUMs accumulate in DECIMAL(27,6) before the final double
  *    cast: double addition is order-dependent, and a 1000-executor
  *    combine order must not change the answer (Exact.sumExact).
  *  - `1.0 * …` ratio idiom → `CAST(1 AS DOUBLE) * …`: both engines
  *    type bare `1.0` as DECIMAL and then diverge in decimal division
  *    scale; forcing the double path makes the arithmetic IEEE-identical.
  *  - `SUM(CASE…1…0)` → wrapped in CAST(… AS BIGINT/INTEGER): DuckDB
  *    sums to HUGEINT, Spark to BIGINT.
  *  - `date_trunc('month', d)` → `CAST(… AS DATE)`: Spark returns
  *    TIMESTAMP, DuckDB DATE.
  *  - every ORDER BY key gets an explicit direction + NULLS LAST and a
  *    unique tie-break key: engines default NULL placement differently,
  *    and the driver's hash compare needs one total order.
  *  - `months_since_disbursement` is built with `asOf` pinned to the
  *    reference's own run date (2026-01-23, ReferenceGoldenSpec), and
  *    the wall-clock `processed_at` column is omitted — the build must
  *    be deterministic to be oracle-checkable.
  *
  * Scale note: the staged portfolio is a dim-sized table (hundreds of
  * rows here; at most millions in any loan book), so every query below
  * is a single-stage scan+agg/window over one small parquet file — the
  * interesting 100 TB machinery lives in the ops packages; this file is
  * about SURFACE fidelity, not throughput.
  */
object RefSql {

  /** The reference's run date — pins months_since_disbursement. */
  private val AsOf = "2026-01-23"

  /** Where the deterministic portfolio build is staged for BOTH engines. */
  private[graft] val StageDir = "/tmp/graft_sqlfront"

  /** Classpath resource → readable file path. sbt runMain packages
    * resources into a jar, so the stream is copied out to the stage
    * dir; from a directory classpath (tests) the copy is equivalent. */
  private def res(name: String): String = {
    val target = java.nio.file.Paths.get(s"$StageDir/refdata/$name")
    java.nio.file.Files.createDirectories(target.getParent)
    val in = getClass.getResourceAsStream(s"/refdata/$name")
    try java.nio.file.Files.copy(in, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target.toString
  }

  @volatile private var staged = false

  /** Build the loan pipeline once per JVM and stage its two output
    * tables as parquet (overwrite = idempotent re-run, S4). */
  private[graft] def ensureStaged(s: SparkSession): Unit = synchronized {
    if (!staged) {
      val raw = LoanPipeline.readApplicationsCsv(s, res("applications_expanded.csv"))
      val (good, quarantined) = LoanPipeline.quarantineApplications(raw)
      val apps = LoanPipeline.cleanApplications(good).cache()
      val lms = LoanPipeline
        .cleanLms(LoanPipeline.readLmsCsv(s, res("lms_updates_expanded.csv")))
        .cache()
      LoanPipeline.portfolio(apps, lms, to_date(lit(AsOf)))
        .coalesce(1).write.mode("overwrite").parquet(s"$StageDir/loan_portfolio")
      LoanPipeline.qualityReport(apps, lms, quarantined)
        .coalesce(1).write.mode("overwrite").parquet(s"$StageDir/data_quality_report")
      apps.unpersist()
      lms.unpersist()
      staged = true
    }
  }

  /** Stage (if needed), expose the staged tables as temp views, and run
    * the reference SQL through `spark.sql` — the verbatim-SQL path. */
  private def runSql(s: SparkSession, body: String): DataFrame = {
    ensureStaged(s)
    s.read.parquet(s"$StageDir/loan_portfolio")
      .createOrReplaceTempView("loan_portfolio")
    s.read.parquet(s"$StageDir/data_quality_report")
      .createOrReplaceTempView("data_quality_report")
    s.sql(body)
  }

  /** The staged portfolio as a DataFrame (for the DSL twins). */
  private[graft] def portfolioDf(s: SparkSession): DataFrame = {
    ensureStaged(s)
    s.read.parquet(s"$StageDir/loan_portfolio")
  }

  private[graft] def reportDf(s: SparkSession): DataFrame = {
    ensureStaged(s)
    s.read.parquet(s"$StageDir/data_quality_report")
  }

  /** Inject the shared-file CTEs so DuckDB reads the same parquet the
    * Spark views wrap. */
  private def oracleize(body: String): String = {
    val ctes =
      s"loan_portfolio AS (SELECT * FROM read_parquet('$StageDir/loan_portfolio/*.parquet')), " +
        s"data_quality_report AS (SELECT * FROM read_parquet('$StageDir/data_quality_report/*.parquet'))"
    val t = body.trim
    if (t.startsWith("WITH")) "WITH " + ctes + "," + t.stripPrefix("WITH")
    else "WITH " + ctes + "\n" + t
  }

  /** Shared-text half-up rounding (see Exact.roundHalfUpSql). */
  private def rnd(e: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"CAST(FLOOR(CAST(($e) AS DOUBLE) * $p + 0.5) AS DOUBLE) / $p"
  }

  private def approvedCount =
    "SUM(CASE WHEN status = 'approved' THEN 1 ELSE 0 END)"

  // ------------------------------------------------------ curated view
  // reference queries.sql:1-22 — NOT IN over the unnested problematic
  // id list (null ids excluded inside the subquery, so NOT IN is safe).

  private val CuratedBody =
    """,
      |curated_portfolio AS (
      |  SELECT * FROM loan_portfolio
      |  WHERE application_id NOT IN (
      |    SELECT application_id FROM problem_ids WHERE application_id IS NOT NULL
      |  )
      |)
      |SELECT * FROM curated_portfolio
      |ORDER BY application_id ASC NULLS LAST""".stripMargin

  private val CuratedSpark =
    """WITH problem_ids AS (
      |  SELECT explode(problematic_application_ids) AS application_id
      |  FROM data_quality_report
      |)""".stripMargin + CuratedBody

  private val CuratedOracle =
    """WITH problem_ids AS (
      |  SELECT unnest(problematic_application_ids) AS application_id
      |  FROM data_quality_report
      |)""".stripMargin + CuratedBody

  // --------------------------------------------- q1 portfolio overview
  // reference queries.sql:26-83.

  private val Q1Body =
    s"""WITH base AS (
       |  SELECT
       |    CAST(date_trunc('month', application_date) AS DATE) AS cohort_month,
       |    installation_type,
       |    LOWER(status) AS status,
       |    loan_amount_eur
       |  FROM loan_portfolio
       |  WHERE application_date IS NOT NULL
       |)
       |SELECT
       |  cohort_month,
       |  installation_type,
       |  COUNT(*) AS total_applications,
       |  CAST($approvedCount AS INTEGER) AS approved_applications,
       |  ${rnd(s"CAST(1 AS DOUBLE) * $approvedCount / NULLIF(COUNT(*), 0)", 4)} AS approval_rate,
       |  ${rnd("SUM(CAST(CASE WHEN status = 'approved' THEN loan_amount_eur ELSE 0 END AS DECIMAL(27,6)))", 2)} AS total_approved_loan_volume,
       |  ${rnd("CAST(SUM(CAST(CASE WHEN status = 'approved' THEN loan_amount_eur END AS DECIMAL(27,6))) AS DOUBLE) / NULLIF(COUNT(CASE WHEN status = 'approved' THEN loan_amount_eur END), 0)", 2)} AS avg_approved_loan_size
       |FROM base
       |GROUP BY cohort_month, installation_type
       |ORDER BY cohort_month ASC NULLS LAST, installation_type ASC NULLS LAST""".stripMargin

  // ------------------------------------------------- q2 risk monitoring
  // reference queries.sql:86-113 (`"status"` → status, not(x) → NOT x,
  // loan_id tie-break appended for a total order).

  private val Q2Body =
    """SELECT
      |  loan_id, application_id, installer_partner_id, installation_type,
      |  credit_score, current_balance_eur, loan_amount_eur, annual_income_eur,
      |  loan_to_income_ratio, application_date, disbursement_date,
      |  delinquency_bucket, days_past_due, months_since_disbursement, status
      |FROM loan_portfolio
      |WHERE NOT flag_credit_score_out_of_range
      |  AND NOT flag_credit_score_missing
      |  AND NOT flag_loan_id_null
      |  AND loan_to_income_ratio IS NOT NULL
      |  AND credit_score < 680
      |  AND loan_to_income_ratio > 0.35
      |ORDER BY disbursement_date DESC NULLS LAST, loan_id ASC NULLS LAST""".stripMargin

  // -------------------------------------------- q3 delinquency analysis
  // reference queries.sql:116-153.

  private def dpdCount(days: Int, op: String = ">") =
    s"SUM(CASE WHEN days_past_due $op $days THEN 1 ELSE 0 END)"

  private val Q3Body =
    s"""WITH disbursed_loans AS (
       |  SELECT installer_partner_id, risk_category, days_past_due
       |  FROM loan_portfolio
       |  WHERE NOT flag_loan_id_null
       |)
       |SELECT
       |  installer_partner_id,
       |  COUNT(*) AS total_loans,
       |  CAST(${dpdCount(30)} AS BIGINT) AS delinquent_loans,
       |  ${rnd(s"CAST(1 AS DOUBLE) * ${dpdCount(30)} / NULLIF(COUNT(*), 0)", 4)} AS delinquency_rate
       |FROM disbursed_loans
       |GROUP BY installer_partner_id
       |ORDER BY delinquency_rate DESC NULLS LAST, total_loans DESC NULLS LAST, installer_partner_id ASC NULLS LAST""".stripMargin

  // ------------------------------------------- q4 performance tracking
  // reference queries.sql:156-203.

  private val Q4Body = {
    def rate(days: Int) =
      rnd(s"CAST(1 AS DOUBLE) * ${dpdCount(days, ">=")} / NULLIF(COUNT(*), 0)", 4)
    s"""WITH disbursed_loans AS (
       |  SELECT
       |    CAST(date_trunc('month', disbursement_date) AS DATE) AS cohort_month,
       |    days_past_due
       |  FROM loan_portfolio
       |  WHERE disbursement_date IS NOT NULL
       |    AND NOT flag_loan_id_null
       |)
       |SELECT
       |  cohort_month,
       |  COUNT(*) AS total_loans,
       |  ${rate(30)} AS dpd_30_rate,
       |  ${rate(60)} AS dpd_60_rate,
       |  ${rate(90)} AS dpd_90_rate
       |FROM disbursed_loans
       |GROUP BY cohort_month
       |ORDER BY cohort_month DESC NULLS LAST""".stripMargin
  }

  // ------------------------------------------------ q5 volume share
  // reference queries.sql:206-245. The per-group volume is rounded to
  // 2dp then re-cast to DECIMAL(18,2) so the window SUM is exact
  // (order-independent) in both engines; the share divides doubles.

  private val Q5Body =
    s"""WITH monthly_volume AS (
       |  SELECT
       |    CAST(date_trunc('month', application_date) AS DATE) AS cohort_month,
       |    installation_type,
       |    CAST(${rnd("SUM(CAST(CASE WHEN LOWER(status) = 'approved' THEN loan_amount_eur ELSE 0 END AS DECIMAL(27,6)))", 2)} AS DECIMAL(18,2)) AS vol
       |  FROM loan_portfolio
       |  WHERE application_date IS NOT NULL
       |    AND NOT flag_installation_type_invalid
       |  GROUP BY cohort_month, installation_type
       |)
       |SELECT
       |  cohort_month,
       |  installation_type,
       |  CAST(vol AS DOUBLE) AS approved_loan_volume,
       |  ${rnd("CAST(vol AS DOUBLE) / NULLIF(CAST(SUM(vol) OVER (PARTITION BY cohort_month) AS DOUBLE), 0)", 4)} AS monthly_volume_share
       |FROM monthly_volume
       |ORDER BY cohort_month ASC NULLS LAST, installation_type ASC NULLS LAST""".stripMargin

  // ------------------------------------------------------- DSL twins
  // The same five queries as DataFrame expressions over the staged
  // portfolio — RefSqlSpec asserts twin ≡ spark.sql(text) row for row,
  // proving the SQL front door and the DSL surface agree.

  private[graft] def curatedDsl(s: SparkSession): DataFrame = {
    val ids = reportDf(s)
      .select(explode(col("problematic_application_ids")).as("application_id"))
      .filter(col("application_id").isNotNull)
    portfolioDf(s)
      .join(ids, Seq("application_id"), "left_anti")
      .orderBy(col("application_id").asc_nulls_last)
  }

  private[graft] def q1Dsl(s: SparkSession): DataFrame = {
    val approved = col("status") === "approved"
    portfolioDf(s)
      .filter(col("application_date").isNotNull)
      .select(
        date_trunc("month", col("application_date")).cast("date").as("cohort_month"),
        col("installation_type"), lower(col("status")).as("status"),
        col("loan_amount_eur"))
      .groupBy(col("cohort_month"), col("installation_type"))
      .agg(
        count(lit(1)).as("total_applications"),
        countWhen(approved).cast("int").as("approved_applications"),
        roundHalfUp(rate(countWhen(approved), count(lit(1))), 4).as("approval_rate"),
        roundHalfUp(sumExactWhen(approved, col("loan_amount_eur")), 2)
          .as("total_approved_loan_volume"),
        roundHalfUp(avgExactWhen(approved, col("loan_amount_eur")), 2)
          .as("avg_approved_loan_size"))
      .orderBy(col("cohort_month").asc_nulls_last,
        col("installation_type").asc_nulls_last)
  }

  private[graft] def q2Dsl(s: SparkSession): DataFrame =
    portfolioDf(s)
      .filter(!col("flag_credit_score_out_of_range") &&
        !col("flag_credit_score_missing") && !col("flag_loan_id_null") &&
        col("loan_to_income_ratio").isNotNull &&
        col("credit_score") < 680 && col("loan_to_income_ratio") > 0.35)
      .select("loan_id", "application_id", "installer_partner_id",
        "installation_type", "credit_score", "current_balance_eur",
        "loan_amount_eur", "annual_income_eur", "loan_to_income_ratio",
        "application_date", "disbursement_date", "delinquency_bucket",
        "days_past_due", "months_since_disbursement", "status")
      .orderBy(col("disbursement_date").desc_nulls_last,
        col("loan_id").asc_nulls_last)

  private[graft] def q3Dsl(s: SparkSession): DataFrame = {
    val late = col("days_past_due") > 30
    portfolioDf(s)
      .filter(!col("flag_loan_id_null"))
      .groupBy(col("installer_partner_id"))
      .agg(
        count(lit(1)).as("total_loans"),
        countWhen(late).as("delinquent_loans"),
        roundHalfUp(rate(countWhen(late), count(lit(1))), 4).as("delinquency_rate"))
      .orderBy(col("delinquency_rate").desc_nulls_last,
        col("total_loans").desc_nulls_last,
        col("installer_partner_id").asc_nulls_last)
  }

  private[graft] def q4Dsl(s: SparkSession): DataFrame = {
    def rateCol(days: Int) =
      roundHalfUp(rate(countWhen(col("days_past_due") >= days), count(lit(1))), 4)
    portfolioDf(s)
      .filter(col("disbursement_date").isNotNull && !col("flag_loan_id_null"))
      .select(date_trunc("month", col("disbursement_date")).cast("date")
        .as("cohort_month"), col("days_past_due"))
      .groupBy(col("cohort_month"))
      .agg(count(lit(1)).as("total_loans"),
        rateCol(30).as("dpd_30_rate"),
        rateCol(60).as("dpd_60_rate"),
        rateCol(90).as("dpd_90_rate"))
      .orderBy(col("cohort_month").desc_nulls_last)
  }

  private[graft] def q5Dsl(s: SparkSession): DataFrame = {
    val monthly = portfolioDf(s)
      .filter(col("application_date").isNotNull &&
        !col("flag_installation_type_invalid"))
      .groupBy(date_trunc("month", col("application_date")).cast("date")
        .as("cohort_month"), col("installation_type"))
      .agg(roundHalfUp(sumExactWhen(lower(col("status")) === "approved",
        col("loan_amount_eur")), 2).cast("decimal(18,2)").as("vol"))
    val w = Window.partitionBy(col("cohort_month"))
    monthly
      .select(col("cohort_month"), col("installation_type"),
        col("vol").cast("double").as("approved_loan_volume"),
        roundHalfUp(col("vol").cast("double") /
          nullif(sum(col("vol")).over(w).cast("double"), lit(0.0)), 4)
          .as("monthly_volume_share"))
      .orderBy(col("cohort_month").asc_nulls_last,
        col("installation_type").asc_nulls_last)
  }

  private def sqlOp(name: String, spark: String, oracle: String): OpDef =
    OpDef(name, (s: SparkSession, _: String) => runSql(s, spark),
      oracleize(oracle))

  val defs: Seq[OpDef] = Seq(
    sqlOp("sql_curated", CuratedSpark, CuratedOracle),
    sqlOp("sql_q1_overview", Q1Body, Q1Body),
    sqlOp("sql_q2_risk", Q2Body, Q2Body),
    sqlOp("sql_q3_delinquency", Q3Body, Q3Body),
    sqlOp("sql_q4_dpd", Q4Body, Q4Body),
    sqlOp("sql_q5_share", Q5Body, Q5Body)
  )
}
