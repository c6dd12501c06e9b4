package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.LoanPipeline

/** End-to-end fidelity against the reference's OWN data and goldens:
  * runs the loan ETL DAG on copies of the reference's input CSVs
  * (src/test/resources/refdata, from /root/reference/data) and diffs
  * the engine's outputs against the committed reference outputs
  * (src/test/resources/refgolden, from /root/reference/output) — the
  * check a real user migrating off the reference would run first.
  *
  * Comparison is value-level over every golden column EXCEPT:
  *  - `processed_at` / `lms_processed_at` — wall-clock stamps
  *    (nondeterministic by design; SURVEY §7.4);
  * `months_since_disbursement` IS compared, by pinning `asOf` to the
  * reference's run date (2026-01-23, visible in its processed_at).
  * The engine's documented extension columns (SURVEY §7.5:
  * `estimated_remaining_balance`, `matches_approved_application`, and
  * the LMS duplicate flags the reference drops from its portfolio
  * projection) are simply not part of the golden column set.
  *
  * Engine values are canonicalized to the goldens' CSV rendering by a
  * plain string cast: Spark and DuckDB both print shortest-round-trip
  * doubles, ISO dates, lowercase booleans, and identically-ordered
  * `to_json` flag maps, so any real semantic difference surfaces as a
  * row diff.
  */
class ReferenceGoldenSpec extends SparkSpecBase {

  private def res(dir: String, name: String): String =
    getClass.getResource(s"/$dir/$name").getPath

  private def golden(name: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(res("refgolden", name))

  private lazy val rawApps =
    LoanPipeline.readApplicationsCsv(spark, res("refdata", "applications_expanded.csv"))
  private lazy val (good, quarantined) = LoanPipeline.quarantineApplications(rawApps)
  private lazy val cleaned = LoanPipeline.cleanApplications(good)
  private lazy val lms =
    LoanPipeline.cleanLms(LoanPipeline.readLmsCsv(spark, res("refdata", "lms_updates_expanded.csv")))
  // The reference ran on 2026-01-23 (its processed_at stamps); pinning
  // asOf makes months_since_disbursement reproducible and comparable.
  private lazy val portfolio =
    LoanPipeline.portfolio(cleaned, lms, to_date(lit("2026-01-23")))

  /** Two-way EXCEPT over the golden's columns (minus exclusions),
    * with engine values stringified. */
  private def assertMatches(engine: DataFrame, gold: DataFrame,
                            exclude: Set[String]): Unit = {
    val cols = gold.columns.filterNot(exclude).toSeq
    val missing = cols.filterNot(engine.columns.contains)
    assert(missing.isEmpty, s"engine lacks golden columns: $missing")
    val e = engine.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val g = gold.select(cols.map(col): _*)
    assert(e.count() === g.count())
    val onlyEngine = e.exceptAll(g).count()
    val onlyGolden = g.exceptAll(e).count()
    assert(onlyEngine === 0 && onlyGolden === 0,
      s"row diffs: engine-only=$onlyEngine golden-only=$onlyGolden")
  }

  test("quarantine catches exactly the reference's malformed row") {
    assert(quarantined.count() === 1)
    assert(good.count() === 199)
  }

  test("cleaned_applications matches the reference golden (199 rows)") {
    assertMatches(cleaned, golden("cleaned_applications.csv"),
      exclude = Set("processed_at"))
  }

  test("loan_portfolio matches the reference golden (244 rows)") {
    assertMatches(portfolio, golden("loan_portfolio.csv"),
      exclude = Set("processed_at", "lms_processed_at"))
  }

  test("CSV exports byte-match the reference goldens (FORCE_QUOTE * parity)") {
    import graft.sources.CsvIO
    // run the DAG exactly as `run` does, but with the goldens'
    // wall-clock stamp pinned in place of current_timestamp — then
    // every byte, including the stamps (and their NULLs on left-join
    // misses), is comparable
    val stamp = "2026-01-23 12:30:57"
    val appsStamped = cleaned.withColumn("processed_at", to_timestamp(lit(stamp)))
    val lmsStamped = lms.withColumn("processed_at", to_timestamp(lit(stamp)))
    val portStamped =
      LoanPipeline.portfolio(appsStamped, lmsStamped, to_date(lit("2026-01-23")))

    def render(engine: DataFrame, goldName: String): DataFrame = {
      val cols = golden(goldName).columns.toSeq
      engine.select(cols.map(c => col(c).cast("string").as(c)): _*)
    }
    def export(df: DataFrame): Seq[String] = {
      val f = java.nio.file.Files.createTempDirectory("graft_bytes_")
        .resolve("out.csv").toString
      CsvIO.writeQuotedCopy(df, f)
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toList finally src.close()
    }
    def goldLines(name: String): Seq[String] = {
      val src = scala.io.Source.fromFile(res("refgolden", name), "UTF-8")
      try src.getLines().toList finally src.close()
    }

    // cleaned_applications: the golden's row order is the source file
    // order, which is ascending application_id — reproducible exactly
    val gotC = export(render(appsStamped.orderBy("application_id"),
      "cleaned_applications.csv"))
    val wantC = goldLines("cleaned_applications.csv")
    assert(gotC.head === wantC.head, "header bytes")
    assert(gotC === wantC, "cleaned_applications bytes")

    // loan_portfolio: the golden's order is DuckDB's join-internal
    // order (no ORDER BY in the reference) — byte parity over the
    // line multiset is the strongest well-defined comparison
    val gotP = export(render(portStamped, "loan_portfolio.csv"))
    val wantP = goldLines("loan_portfolio.csv")
    assert(gotP.head === wantP.head, "header bytes")
    assert(gotP.tail.sorted === wantP.tail.sorted, "loan_portfolio bytes")

    // data_quality_report: one row; the id array renders as DuckDB's
    // bracketed join with NULL spelled out
    val rep = LoanPipeline.qualityReport(appsStamped, lmsStamped, quarantined)
      .withColumn("problematic_application_ids",
        concat(lit("["),
          array_join(col("problematic_application_ids"), ", ", "NULL"),
          lit("]")))
      .withColumn("processed_at", to_timestamp(lit(stamp)))
    assert(export(render(rep, "data_quality_report.csv"))
      === goldLines("data_quality_report.csv"), "data_quality_report bytes")
  }

  test("data_quality_report tallies and problematic ids match") {
    val report = LoanPipeline.qualityReport(cleaned, lms, quarantined)
    val gold = golden("data_quality_report.csv")
    val tallies = gold.columns.toSeq
      .filterNot(Set("problematic_application_ids", "processed_at"))
    val e = report.select(tallies.map(c => col(c).cast("string").as(c)): _*).first()
    val g = gold.select(tallies.map(col): _*).first()
    for ((c, i) <- tallies.zipWithIndex)
      assert(e.getString(i) === g.getString(i), s"tally $c")

    // Golden renders the id list as DuckDB's bracketed join, NULL last.
    val goldenIds = gold.select("problematic_application_ids").first().getString(0)
      .stripPrefix("[").stripSuffix("]").split(", ", -1).toSeq
      .map(s => if (s == "NULL") null else s)
    val engineIds = report.select("problematic_application_ids")
      .first().getSeq[String](0)
    assert(engineIds === goldenIds)
  }
}
