package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL front door (RefSql): the reference's queries.sql run through
  * `spark.sql` must agree row-for-row with their DataFrame-DSL twins
  * over the same staged portfolio — the two public surfaces of the
  * engine cannot drift. Values are compared stringified (exact), order
  * ignored (both sides already pin a total order; comparing as sets
  * keeps the assertion about CONTENT, not sort stability).
  */
class RefSqlSpec extends SparkSpecBase {

  private def sqlResult(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def assertSame(sql: DataFrame, dsl: DataFrame): Unit = {
    assert(sql.columns.toSeq === dsl.columns.toSeq, "column sets differ")
    val s = sql.select(sql.columns.map(c => col(c).cast("string").as(c)): _*)
    val d = dsl.select(dsl.columns.map(c => col(c).cast("string").as(c)): _*)
    assert(s.count() === d.count(), "row counts differ")
    assert(s.exceptAll(d).count() === 0 && d.exceptAll(s).count() === 0,
      "row contents differ")
  }

  test("curated view: spark.sql ≡ DSL twin, excludes every problematic id") {
    val sql = sqlResult("sql_curated")
    assertSame(sql, ops.RefSql.curatedDsl(spark))
    // no curated row carries a problematic application id
    val ids = ops.RefSql.reportDf(spark)
      .select(explode(col("problematic_application_ids")).as("id"))
      .filter(col("id").isNotNull)
    assert(sql.join(ids, sql("application_id") === ids("id")).count() === 0)
  }

  test("q1 overview: spark.sql ≡ DSL twin") {
    assertSame(sqlResult("sql_q1_overview"), ops.RefSql.q1Dsl(spark))
  }

  test("q2 risk: spark.sql ≡ DSL twin, every row breaches both thresholds") {
    val sql = sqlResult("sql_q2_risk")
    assertSame(sql, ops.RefSql.q2Dsl(spark))
    assert(sql.filter(col("credit_score") >= 680 ||
      col("loan_to_income_ratio") <= 0.35).count() === 0)
  }

  test("q3 delinquency: spark.sql ≡ DSL twin") {
    assertSame(sqlResult("sql_q3_delinquency"), ops.RefSql.q3Dsl(spark))
  }

  test("q4 dpd cohorts: spark.sql ≡ DSL twin, rates are monotone") {
    val sql = sqlResult("sql_q4_dpd")
    assertSame(sql, ops.RefSql.q4Dsl(spark))
    // 30-day delinquency can only be at least as common as 60/90-day
    assert(sql.filter(col("dpd_30_rate") < col("dpd_60_rate") ||
      col("dpd_60_rate") < col("dpd_90_rate")).count() === 0)
  }

  test("q5 share: spark.sql ≡ DSL twin, shares sum to ~1 per month") {
    val sql = sqlResult("sql_q5_share")
    assertSame(sql, ops.RefSql.q5Dsl(spark))
    val bad = sql.groupBy(col("cohort_month"))
      .agg(sum(col("monthly_volume_share")).as("total"))
      .filter(abs(col("total") - 1.0) > 0.01)
    assert(bad.count() === 0)
  }
}
