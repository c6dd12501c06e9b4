package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.LoanPipeline

/** Golden-count tests for the reference-fidelity loan ETL on the
  * hand-built fixture CSVs (src/test/resources/loanfix — original data
  * reproducing the edge-case catalog in FIXTURES.md §A: quarantine row,
  * duplicate ids, literal "NULL" strings, out-of-range scores, invalid
  * postals, type-domain violations, date inconsistencies, blank keys).
  */
class LoanPipelineSpec extends SparkSpecBase {

  private def res(name: String): String =
    getClass.getResource(s"/loanfix/$name").getPath

  private lazy val rawApps = LoanPipeline.readApplicationsCsv(spark, res("applications.csv"))
  private lazy val split = LoanPipeline.quarantineApplications(rawApps)
  private lazy val apps = LoanPipeline.cleanApplications(split._1).cache()
  private lazy val lms = LoanPipeline.cleanLms(
    LoanPipeline.readLmsCsv(spark, res("lms_updates.csv"))).cache()

  private def flagCount(df: org.apache.spark.sql.DataFrame, flag: String): Long =
    df.filter(col(flag)).count()

  test("quarantine isolates exactly the extra-delimiter row") {
    assert(split._2.count() === 1)
    assert(split._2.select("application_id").first().getString(0) === "APP027")
    assert(split._1.count() === 29)
  }

  test("application flag tallies match fixture goldens") {
    assert(apps.count() === 29)
    val expected = Map(
      "flag_application_id_null" -> 0L,
      "flag_application_id_duplicate" -> 2L,
      "flag_loan_amount_non_positive" -> 2L,
      "flag_credit_score_missing" -> 2L,
      "flag_credit_score_out_of_range" -> 2L,
      "flag_postal_code_invalid" -> 3L,
      "flag_installation_type_invalid" -> 1L,
      "flag_system_size_invalid" -> 3L,
      "flag_system_size_present_for_heat_pump" -> 1L)
    for ((f, n) <- expected) assert(flagCount(apps, f) === n, f)
  }

  test("typing: literal NULL strings and malformed values become NULL") {
    val app009 = apps.filter(col("application_id") === "APP009").first()
    assert(app009.isNullAt(app009.fieldIndex("credit_score")))
    val app021 = apps.filter(col("application_id") === "APP021").first()
    assert(app021.isNullAt(app021.fieldIndex("application_date")))
    val app023 = apps.filter(col("application_id") === "APP023").first()
    assert(app023.isNullAt(app023.fieldIndex("annual_income_eur")))
  }

  test("email normalization lowercases and strips all whitespace") {
    val got = apps.filter(col("application_id").isin("APP002", "APP003"))
      .orderBy("application_id")
      .select("customer_email").collect().map(_.getString(0))
    assert(got.toSeq === Seq("bob@example.com", "carol@example.com"))
  }

  test("risk_category banding matches reference semantics") {
    val byCat = apps.groupBy("risk_category").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCat === Map(
      "Unknown" -> 2L, "Invalid" -> 2L, "Excellent" -> 4L,
      "Good" -> 16L, "Fair" -> 3L, "Poor" -> 2L))
  }

  test("loan_to_income_ratio NULL-guards non-positive amounts and incomes") {
    val nulls = apps.filter(col("loan_to_income_ratio").isNull)
      .select("application_id").collect().map(_.getString(0)).toSet
    assert(nulls === Set("APP007", "APP020", "APP023", "APP024"))
    val app001 = apps.filter(col("application_id") === "APP001").first()
    assert(math.abs(app001.getAs[Double]("loan_to_income_ratio") - 20000.0 / 55000.0) < 1e-12)
  }

  test("data_quality_flags is ordered JSON of all nine flags") {
    val clean = apps.filter(col("application_id") === "APP001")
      .select("data_quality_flags").first().getString(0)
    assert(clean ===
      """{"application_id_null":false,"application_id_duplicate":false,""" +
      """"loan_amount_non_positive":false,"credit_score_missing":false,""" +
      """"credit_score_out_of_range":false,"postal_code_invalid":false,""" +
      """"installation_type_invalid":false,"system_size_invalid":false,""" +
      """"system_size_present_for_heat_pump":false}""")
  }

  test("lms flag tallies match fixture goldens") {
    assert(lms.count() === 17)
    val expected = Map(
      "flag_loan_id_null" -> 1L,
      "flag_application_id_null" -> 1L,
      "flag_application_id_invalid_format" -> 1L,
      "flag_loan_id_duplicate" -> 2L,
      "flag_application_id_duplicate" -> 2L,
      "flag_current_balance_negative" -> 1L,
      "flag_days_past_due_negative" -> 1L,
      "flag_last_payment_before_disbursement" -> 1L,
      "flag_next_due_before_disbursement" -> 1L,
      "flag_last_payment_after_next_due" -> 1L)
    for ((f, n) <- expected) assert(flagCount(lms, f) === n, f)
  }

  test("delinquency buckets match reference banding") {
    val byBucket = lms.groupBy("delinquency_bucket").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    // Note: negative dpd (-5) lands in the ELSE 'Default' branch — a
    // reference quirk preserved as-written (pipeline.py:293-299).
    assert(byBucket === Map(
      "Current" -> 9L, "Late" -> 4L, "Delinquent" -> 1L,
      "Default" -> 2L, "NULL" -> 1L))
  }

  test("portfolio left join fans out duplicate-matched applications") {
    val port = LoanPipeline.portfolio(apps, lms, asOf = lit("2025-01-15").cast("date"))
    assert(port.count() === 30) // 29 apps, APP001 matches two LMS rows
    val app001 = port.filter(col("application_id") === "APP001")
    assert(app001.count() === 2)
    // months_since_disbursement is boundary-crossing month arithmetic:
    // 2024-02-01 → 2025-01-15 crosses 11 month boundaries.
    val months = app001.select("months_since_disbursement")
      .collect().map(_.getLong(0)).sorted
    assert(months.toSeq === Seq(5L, 11L))
    // spec-required derived fields the reference omitted (SURVEY §7.5)
    val unmatched = port.filter(col("lms_application_id").isNull)
    assert(unmatched.count() === 16)
    val est = port.filter(col("application_id") === "APP004").first()
    assert(est.getAs[Double]("estimated_remaining_balance") === 15000.0)
  }

  test("quality report is one row with golden tallies and sorted problem ids") {
    val report = LoanPipeline.qualityReport(apps, lms, split._2)
    val r = report.first()
    assert(report.count() === 1)
    assert(r.getAs[Long]("applications_processed") === 29)
    assert(r.getAs[Long]("quarantined_applications") === 1)
    assert(r.getAs[Long]("lms_processed") === 17)
    assert(r.getAs[Long]("app_application_id_duplicate") === 2)
    assert(r.getAs[Long]("app_system_size_invalid") === 3)
    assert(r.getAs[Long]("lms_loan_id_duplicate") === 2)
    assert(r.getAs[Long]("lms_last_payment_after_next_due") === 1)
    val ids = r.getAs[scala.collection.Seq[String]]("problematic_application_ids")
    assert(ids.size === 24)
    assert(ids.last == null) // NULL id present and sorted last (DuckDB parity)
    val nonNull = ids.init
    assert(nonNull === nonNull.sorted)
    assert(nonNull.contains("APP_DECLINED") && nonNull.contains("APP026"))
  }

  test("full run writes three quoted CSV exports") {
    val out = Files.createTempDirectory("loan_out_").toString
    val counts = LoanPipeline.run(spark, res("applications.csv"),
      res("lms_updates.csv"), out)
    assert(counts("cleaned_applications") === 29)
    assert(counts("loan_portfolio") === 30)
    assert(counts("quarantined") === 1)
    for (d <- Seq("cleaned_applications", "loan_portfolio", "data_quality_report")) {
      val files = new java.io.File(s"$out/$d").listFiles()
      assert(files.exists(_.getName.endsWith(".csv")), d)
    }
    // re-read the portfolio export: header + quoting round-trips
    val back = spark.read.option("header", "true").csv(s"$out/loan_portfolio")
    assert(back.count() === 30)
    assert(back.columns.contains("estimated_remaining_balance"))
  }
}
