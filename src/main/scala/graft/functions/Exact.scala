package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic-exact aggregate builders.
  *
  * Floating-point SUM/AVG are order-dependent: at 1000 executors the
  * combine order of partial aggregates differs run to run, so a raw
  * `sum(double)` is not reproducible (and cannot hash-match a
  * single-threaded DuckDB oracle). The fix is exact accumulation:
  * cast to a decimal wide enough to hold the input losslessly-enough,
  * sum exactly (decimal addition is associative), and only then convert
  * to double. Cost is ~the same (decimal sum is codegen'd); the result
  * is bit-identical across any partitioning — which is exactly the
  * property a 100 TB job needs for reproducible output.
  *
  * Scale 6 keeps any realistic money/measure value away from decimal
  * rounding ties while fitting 38-digit precision limits on the
  * accumulator.
  */
object Exact {
  private val Dec = DecimalType(27, 6)

  /** Exact sum of a double column, returned as double. */
  def sumExact(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact conditional sum (`SUM(CASE WHEN cond THEN c ELSE 0 END)`). */
  def sumExactWhen(cond: Column, c: Column): Column =
    sum(when(cond, c).otherwise(lit(0)).cast(Dec)).cast("double")

  /** Exact average of a double column (NULLs skipped), as double. */
  def avgExact(c: Column): Column =
    (sum(c.cast(Dec)).cast("double") / count(c)).cast("double")

  /** Exact average over only the rows where `cond` holds
    * (`AVG(CASE WHEN cond THEN c END)` — no ELSE, others excluded). */
  def avgExactWhen(cond: Column, c: Column): Column =
    (sum(when(cond, c).cast(Dec)).cast("double") / count(when(cond, c)))
      .cast("double")

  /** `SUM(CASE WHEN cond THEN 1 ELSE 0 END)` as BIGINT. */
  def countWhen(cond: Column): Column =
    sum(when(cond, 1).otherwise(0)).cast("long")

  /** `1.0 * num / NULLIF(den, 0)` ratio-of-aggregates as double. */
  def rate(num: Column, den: Column): Column =
    lit(1.0) * num / nullif(den.cast("long"), lit(0L))

  /** Deterministic half-up rounding to `n` decimal places.
    *
    * Engines disagree on `round(double, n)` ties (Spark rounds the
    * exact binary expansion via BigDecimal HALF_UP; DuckDB scales and
    * rounds the scaled double), so oracle-checked outputs use
    * `floor(x*10^n + 0.5)/10^n` — plain IEEE multiply/add/floor/divide,
    * bit-identical in any engine. Mirror the same formula in oracle SQL.
    */
  def roundHalfUp(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    (floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)).cast("double")
  }

  /** SQL text twin of [[roundHalfUp]] for oracle queries. */
  def roundHalfUpSql(expr: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"CAST(FLOOR(($expr) * $p + 0.5) AS DOUBLE) / $p"
  }
}
