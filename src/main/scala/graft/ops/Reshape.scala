package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Reshape operators: pivot (long → wide) and unpivot (wide → long).
  * Not exercised by the reference (its report stays long-form), but a
  * standard part of the analytics surface the engine completes.
  *
  * Scale design: pivot with an EXPLICIT value list is one hash
  * aggregation on the group key — each output cell is a conditional
  * aggregate, no second pass, no collect-distinct of the pivot column
  * on the driver (passing the values is mandatory at 100 TB; without
  * them Spark runs a distinct scan first). Unpivot is a row-local
  * generator (each input row emits k output rows from its own
  * columns) — no shuffle at all before the output sort.
  */
object Reshape {

  private val Statuses = Seq("F", "O", "P")

  /** Order volume per priority, pivoted wide on order status. Sums are
    * decimal-exact then cast back ([[graft.functions.Exact]]) so the
    * result is identical on any partitioning and to the oracle. */
  private def reshapePivot(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Statuses)
      .agg(sumExact($"o_totalprice"))
      .orderBy($"o_orderpriority")
  }

  private def pivotOracle: String = {
    val cells = Statuses.map(st =>
      s"""CAST(SUM(CASE WHEN o_orderstatus = '$st'
         |    THEN CAST(o_totalprice AS DECIMAL(27,6)) END) AS DOUBLE) AS "$st"""".stripMargin)
    s"""SELECT o_orderpriority,
       |  ${cells.mkString(",\n  ")}
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** Part attributes unpivoted long: one (attr, value) row per numeric
    * column, values unified to DOUBLE. Row-local — each row emits its
    * own attribute rows; no shuffle before the output sort. */
  private def reshapeUnpivot(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey", $"p_size".cast("double").as("p_size"),
        $"p_retailprice")
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")),
        "attr", "value")
      .orderBy($"p_partkey", $"attr")
  }

  private def unpivotOracle: String =
    s"""SELECT p_partkey, attr, value FROM (
       |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS value
       |  FROM part
       |  UNION ALL
       |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS value
       |  FROM part
       |)
       |ORDER BY p_partkey, attr""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("reshape_pivot", reshapePivot _, pivotOracle),
    OpDef("reshape_unpivot", reshapeUnpivot _, unpivotOracle)
  )
}
