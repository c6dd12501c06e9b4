package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Cohort-style analytics (reference `queries.sql:26-83` re-targeted to
  * the testdata star schema — monthly cohort × category with conditional
  * aggregates and safe ratios).
  *
  * Shape: single scan → map-side partial agg → one shuffle on the group
  * keys → final agg → sort. At scale the cardinality of
  * (month, priority) is tiny, so the shuffle moves only partial-agg
  * states, not rows; the parquet scan reads exactly the four referenced
  * columns (verified via `ReadSchema` in the formatted plan).
  */
object Cohorts {

  /** q1_cohort — monthly cohort × order priority: volume, conditional
    * counts/sums, approval-rate analogue. Reference: `queries.sql:26-83`
    * (cohort_month × installation_type with approval aggregates). */
  def q1Cohort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, sfDir)
      .filter($"o_orderdate".isNotNull)
      .select(
        date_trunc("month", $"o_orderdate").as("cohort_month"),
        $"o_orderpriority",
        $"o_orderstatus",
        $"o_totalprice")
    val finished = $"o_orderstatus" === "F"
    base
      .groupBy($"cohort_month", $"o_orderpriority")
      .agg(
        count(lit(1)).as("total_orders"),
        countWhen(finished).as("finished_orders"),
        roundHalfUp(rate(countWhen(finished), count(lit(1))), 4).as("finish_rate"),
        roundHalfUp(sumExactWhen(finished, $"o_totalprice"), 2).as("finished_value"),
        roundHalfUp(avgExactWhen(finished, $"o_totalprice"), 2).as("avg_finished_value"))
      .orderBy($"cohort_month", $"o_orderpriority")
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("q1_cohort", q1Cohort _,
      """WITH base AS (
        |  SELECT date_trunc('month', o_orderdate) AS cohort_month,
        |         o_orderpriority, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderdate IS NOT NULL
        |)
        |SELECT cohort_month, o_orderpriority,
        |  COUNT(*) AS total_orders,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
        |  CAST(FLOOR((1.0 * SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / NULLIF(COUNT(*), 0)) * 10000 + 0.5) AS DOUBLE) / 10000 AS finish_rate,
        |  CAST(FLOOR((CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)) * 100 + 0.5) AS DOUBLE) / 100 AS finished_value,
        |  CAST(FLOOR((CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE)
        |        / COUNT(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)) * 100 + 0.5) AS DOUBLE) / 100 AS avg_finished_value
        |FROM base
        |GROUP BY cohort_month, o_orderpriority
        |ORDER BY cohort_month, o_orderpriority""".stripMargin)
  )
}
