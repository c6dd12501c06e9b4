package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders for the loan-domain pipeline — single source
  * of truth for semantics the reference computes in two places (e.g.
  * delinquency_bucket at `pipeline.py:293-299` AND `pipeline.py:368-374`;
  * SURVEY §7.5).
  */
object Loan {

  val InstallationTypes: Seq[String] = Seq("solar_pv", "solar_battery", "heat_pump")

  /** Null-or-blank test (reference `pipeline.py:93,149`). */
  def nullOrBlank(c: Column): Column = c.isNull || trim(c) === ""

  /** Credit-score band (reference `pipeline.py:164-171`). */
  def riskCategory(creditScore: Column): Column =
    when(creditScore.isNull, "Unknown")
      .when(creditScore < 300 || creditScore > 850, "Invalid")
      .when(creditScore >= 750, "Excellent")
      .when(creditScore.between(700, 749), "Good")
      .when(creditScore.between(650, 699), "Fair")
      .otherwise("Poor")

  /** Days-past-due band (reference `pipeline.py:293-299`). */
  def delinquencyBucket(daysPastDue: Column): Column =
    when(daysPastDue.isNull, lit(null).cast("string"))
      .when(daysPastDue === 0, "Current")
      .when(daysPastDue.between(1, 30), "Late")
      .when(daysPastDue.between(31, 90), "Delinquent")
      .otherwise("Default")

  /** Month difference as calendar-boundary crossings — DuckDB
    * `date_diff('month', d1, d2)` semantics (reference
    * `pipeline.py:376-379`), NOT Spark's fractional `months_between`. */
  def monthDiff(from: Column, to: Column): Column =
    ((year(to) * 12 + month(to)) - (year(from) * 12 + month(from))).cast("long")

  /** JSON-serialized ordered map of named boolean flags (reference
    * `pipeline.py:179-200` data_quality_flags). Spark's `to_json(map)`
    * preserves entry order like DuckDB's. */
  def jsonFlags(flags: Seq[(String, Column)]): Column =
    to_json(map(flags.flatMap { case (k, v) => Seq(lit(k), v) }: _*))

  /** Berlin-local wall clock truncated to seconds (reference
    * `pipeline.py:202` processed_at). Nondeterministic by design —
    * excluded from golden comparisons. */
  def processedAt(): Column =
    date_trunc("second", from_utc_timestamp(current_timestamp(), "Europe/Berlin"))
}
