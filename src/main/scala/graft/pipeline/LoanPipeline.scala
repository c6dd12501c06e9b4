package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Loan._
import graft.sources.CsvIO

/** The reference's full ETL DAG (`pipeline.py:25-533`) re-expressed as
  * pure DataFrame transformations — no SQL-string plumbing, one
  * function per materialized stage:
  *
  * {{{
  * raw apps CSV ─→ (good, quarantined)          pipeline.py:89-113
  * good ─→ cleanedApplications (typed+flags)    pipeline.py:128-205
  * raw LMS CSV ─→ cleanedLms (typed+flags)      pipeline.py:241-330
  * cleaned ⟕ lms ─→ portfolio                   pipeline.py:338-384
  * all ─→ qualityReport (1-row summary)         pipeline.py:390-492
  * }}}
  *
  * Scale notes: duplicate flags use a window count over the key instead
  * of the reference's `IN (SELECT …)` — one shuffle on the key, no
  * second scan, no driver-side list. The applications frame feeds three
  * consumers (portfolio, report counts, problematic ids), so `run`
  * caches it — the analogue of the reference materializing every CTAS.
  * `processed_at` wall-clock stamps are appended only in `run`, keeping
  * the stage functions deterministic and unit-testable.
  */
object LoanPipeline {

  val AppColumns: Seq[String] = Seq(
    "application_id", "customer_email", "installer_partner_id",
    "installation_type", "system_size_kwp", "loan_amount_eur",
    "loan_term_months", "application_date", "credit_score",
    "annual_income_eur", "postal_code", "status")

  val LmsColumns: Seq[String] = Seq(
    "loan_id", "application_id", "disbursement_date", "current_balance_eur",
    "days_past_due", "payment_status", "last_payment_date", "next_payment_due")

  /** Robust all-varchar CSV read with one overflow column (S1). */
  def readApplicationsCsv(spark: SparkSession, path: String): DataFrame =
    CsvIO.readRobust(spark, path, AppColumns, overflowColumns = 1)

  def readLmsCsv(spark: SparkSession, path: String): DataFrame =
    CsvIO.readRobust(spark, path, LmsColumns, overflowColumns = 1)

  /** Quarantine split on the overflow column (reference
    * `pipeline.py:89-113`): rows with a 13th field had an unescaped
    * delimiter and cannot be repaired safely. */
  def quarantineApplications(raw: DataFrame): (DataFrame, DataFrame) =
    CsvIO.quarantine(raw)

  /** Typed + flagged applications (reference `pipeline.py:128-205`). */
  def cleanApplications(good: DataFrame): DataFrame = {
    val typed = good.select(
      col("application_id"),
      regexp_replace(lower(col("customer_email")), "\\s+", "").as("customer_email"),
      col("installer_partner_id"),
      col("installation_type"),
      expr("try_cast(system_size_kwp AS DOUBLE)").as("system_size_kwp"),
      expr("try_cast(loan_amount_eur AS DOUBLE)").as("loan_amount_eur"),
      expr("try_cast(loan_term_months AS INT)").as("loan_term_months"),
      expr("try_cast(application_date AS DATE)").as("application_date"),
      expr("try_cast(credit_score AS INT)").as("credit_score"),
      expr("try_cast(annual_income_eur AS DOUBLE)").as("annual_income_eur"),
      col("postal_code"),
      lower(col("status")).as("status"))

    // Duplicate flag: window count over the key — single shuffle, no
    // IN-subquery materialization (reference pipeline.py:117-124,150).
    val idCount = Window.partitionBy(col("application_id"))
    val flagged = typed
      .withColumn("flag_application_id_null", nullOrBlank(col("application_id")))
      .withColumn("flag_application_id_duplicate",
        count(lit(1)).over(idCount) > 1 && col("application_id").isNotNull)
      .withColumn("flag_loan_amount_non_positive",
        col("loan_amount_eur").isNull || col("loan_amount_eur") <= 0.0)
      .withColumn("flag_credit_score_missing", col("credit_score").isNull)
      .withColumn("flag_credit_score_out_of_range",
        col("credit_score").isNotNull &&
          (col("credit_score") < 300 || col("credit_score") > 850))
      .withColumn("flag_postal_code_invalid",
        col("postal_code").isNull || !col("postal_code").rlike("^[0-9]{5}$"))
      .withColumn("flag_installation_type_invalid",
        col("installation_type").isNull ||
          !col("installation_type").isin(InstallationTypes: _*))
      .withColumn("flag_system_size_invalid",
        col("installation_type").isin("solar_pv", "solar_battery") &&
          (col("system_size_kwp").isNull || col("system_size_kwp") <= 0.0))
      .withColumn("flag_system_size_present_for_heat_pump",
        col("installation_type") === "heat_pump" && col("system_size_kwp").isNotNull)

    flagged
      .withColumn("risk_category", riskCategory(col("credit_score")))
      .withColumn("loan_to_income_ratio",
        when(col("annual_income_eur").isNull || col("annual_income_eur") <= 0.0 ||
          col("flag_loan_amount_non_positive"), lit(null).cast("double"))
          .otherwise(col("loan_amount_eur") / col("annual_income_eur")))
      .withColumn("data_quality_flags", jsonFlags(appFlagNames.map(n => n.stripPrefix("flag_") -> col(n))))
  }

  val appFlagNames: Seq[String] = Seq(
    "flag_application_id_null", "flag_application_id_duplicate",
    "flag_loan_amount_non_positive", "flag_credit_score_missing",
    "flag_credit_score_out_of_range", "flag_postal_code_invalid",
    "flag_installation_type_invalid", "flag_system_size_invalid",
    "flag_system_size_present_for_heat_pump")

  val lmsFlagNames: Seq[String] = Seq(
    "flag_loan_id_null", "flag_application_id_null",
    "flag_application_id_invalid_format", "flag_loan_id_duplicate",
    "flag_application_id_duplicate", "flag_current_balance_negative",
    "flag_days_past_due_negative", "flag_last_payment_before_disbursement",
    "flag_next_due_before_disbursement", "flag_last_payment_after_next_due")

  /** Typed + flagged LMS updates (reference `pipeline.py:241-330`). */
  def cleanLms(raw: DataFrame): DataFrame = {
    val typed = raw.select(
      col("loan_id"),
      col("application_id"),
      expr("try_cast(disbursement_date AS DATE)").as("disbursement_date"),
      expr("try_cast(current_balance_eur AS DOUBLE)").as("current_balance_eur"),
      expr("try_cast(days_past_due AS INT)").as("days_past_due"),
      lower(col("payment_status")).as("payment_status"),
      expr("try_cast(last_payment_date AS DATE)").as("last_payment_date"),
      expr("try_cast(next_payment_due AS DATE)").as("next_payment_due"))

    // Reference dupe sets exclude null/blank keys (pipeline.py:212-229);
    // the IN-flag is then false for null keys, which the window count
    // reproduces by guarding on the key.
    val byLoan = Window.partitionBy(col("loan_id"))
    val byApp = Window.partitionBy(col("application_id"))
    val flagged = typed
      .withColumn("flag_loan_id_null", nullOrBlank(col("loan_id")))
      .withColumn("flag_application_id_null", nullOrBlank(col("application_id")))
      .withColumn("flag_application_id_invalid_format",
        col("application_id").isNotNull && !col("application_id").rlike("^APP[0-9]+$"))
      .withColumn("flag_loan_id_duplicate",
        !nullOrBlank(col("loan_id")) && count(lit(1)).over(byLoan) > 1)
      .withColumn("flag_application_id_duplicate",
        !nullOrBlank(col("application_id")) && count(lit(1)).over(byApp) > 1)
      .withColumn("flag_current_balance_negative",
        col("current_balance_eur").isNotNull && col("current_balance_eur") < 0.0)
      .withColumn("flag_days_past_due_negative",
        col("days_past_due").isNotNull && col("days_past_due") < 0)
      .withColumn("flag_last_payment_before_disbursement",
        col("last_payment_date").isNotNull && col("disbursement_date").isNotNull &&
          col("last_payment_date") < col("disbursement_date"))
      .withColumn("flag_next_due_before_disbursement",
        col("next_payment_due").isNotNull && col("disbursement_date").isNotNull &&
          col("next_payment_due") < col("disbursement_date"))
      .withColumn("flag_last_payment_after_next_due",
        col("last_payment_date").isNotNull && col("next_payment_due").isNotNull &&
          col("last_payment_date") > col("next_payment_due"))

    flagged
      .withColumn("delinquency_bucket", delinquencyBucket(col("days_past_due")))
      .withColumn("data_quality_flags", jsonFlags(lmsFlagNames.map(n => n.stripPrefix("flag_") -> col(n))))
  }

  /** Applications ⟕ LMS portfolio with collision renames and derived
    * fields (reference `pipeline.py:338-384`). Also adds the two
    * columns the exercise spec requires but the reference never built
    * (SURVEY §7.5): `estimated_remaining_balance` and
    * `matches_approved_application`. */
  def portfolio(cleanedApps: DataFrame, lms: DataFrame,
                asOf: Column = current_date()): DataFrame = {
    val l = lms
      .withColumnRenamed("application_id", "lms_application_id")
      .withColumnRenamed("flag_application_id_null", "flag_application_id_null_lms")
      .withColumnRenamed("flag_application_id_duplicate", "flag_application_id_duplicate_lms")
      .withColumnRenamed("data_quality_flags", "lms_data_quality_flags")
      // the LMS wall-clock stamp keeps its own column (no-op when the
      // caller stamped neither side)
      .withColumnRenamed("processed_at", "lms_processed_at")
      .drop("delinquency_bucket") // recomputed portfolio-side, reference quirk
    val a = cleanedApps
    a.join(l, a("application_id") === l("lms_application_id"), "left")
      .withColumn("delinquency_bucket", delinquencyBucket(col("days_past_due")))
      .withColumn("months_since_disbursement",
        when(col("disbursement_date").isNull, lit(null).cast("long"))
          .otherwise(monthDiff(col("disbursement_date"), asOf)))
      .withColumn("estimated_remaining_balance",
        coalesce(col("current_balance_eur"), col("loan_amount_eur")))
      .withColumn("matches_approved_application",
        col("lms_application_id").isNotNull && col("status") === "approved")
  }

  /** One-row data-quality summary (reference `pipeline.py:390-492`):
    * global flag tallies from both sides, quarantine count, and the
    * sorted distinct list of problematic application ids. */
  def qualityReport(cleanedApps: DataFrame, lms: DataFrame,
                    quarantined: DataFrame): DataFrame = {
    def tallies(df: DataFrame, total: String, prefix: String,
                flags: Seq[String]): DataFrame =
      df.agg(
        count(lit(1)).as(total),
        flags.map(f => sum(col(f).cast("int")).cast("long")
          .as(prefix + f.stripPrefix("flag_"))): _*)

    val appCounts = tallies(cleanedApps, "applications_processed", "app_", appFlagNames)
    val lmsCounts = tallies(lms, "lms_processed", "lms_", lmsFlagNames)
    val quarantineCounts = quarantined.agg(count(lit(1)).as("quarantined_applications"))

    val appProblem = cleanedApps
      .filter(appFlagNames.map(col).reduce(_ || _))
      .select(col("application_id"))
    val lmsProblem = lms
      .filter(lmsFlagNames.map(col).reduce(_ || _))
      .select(col("application_id"))
    // SQL UNION dedups (SURVEY §7.4 O3) — union + distinct here.
    val problematicIds = appProblem.union(lmsProblem).distinct()
      .agg(array_sort(collect_list(col("application_id"))).as("ids_non_null"),
        max(col("application_id").isNull).as("has_null_id"))
      // array_agg(ORDER BY) keeps NULLs (last); collect_list drops them
      // — re-append when any null id was present for reference parity.
      .select(when(col("has_null_id"),
          concat(col("ids_non_null"), array(lit(null).cast("string"))))
        .otherwise(col("ids_non_null")).as("problematic_application_ids"))

    appCounts
      .crossJoin(lmsCounts)
      .crossJoin(quarantineCounts)
      .crossJoin(problematicIds)
  }

  /** Full DAG (reference `main()`, `pipeline.py:25-533`): read, split,
    * clean, join, report, export three quoted CSVs. */
  def run(spark: SparkSession, applicationsCsv: String, lmsCsv: String,
          outDir: String): Map[String, Long] = {
    val rawApps = readApplicationsCsv(spark, applicationsCsv)
    val (good, quarantined) = quarantineApplications(rawApps)
    val apps = cleanApplications(good)
      .withColumn("processed_at", processedAt())
      .cache() // read by portfolio, tallies, and problematic ids
    val lms = cleanLms(readLmsCsv(spark, lmsCsv))
      .withColumn("processed_at", processedAt())
      .cache()
    val port = portfolio(apps, lms)
    val report = qualityReport(apps, lms, quarantined)

    CsvIO.writeQuoted(apps, s"$outDir/cleaned_applications", singleFile = true)
    CsvIO.writeQuoted(port, s"$outDir/loan_portfolio", singleFile = true)
    // Spark's CSV sink cannot serialize arrays — export the id list as
    // its JSON text (the reference's CSV shows DuckDB's list rendering).
    CsvIO.writeQuoted(
      report.withColumn("problematic_application_ids",
          to_json(col("problematic_application_ids")))
        .withColumn("processed_at", processedAt()),
      s"$outDir/data_quality_report", singleFile = true)
    Map(
      "cleaned_applications" -> apps.count(),
      "loan_portfolio" -> port.count(),
      "quarantined" -> quarantined.count())
  }
}
