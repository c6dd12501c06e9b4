package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Sorts, limits, set operations — SURVEY §2.6 (O1-O3) plus
  * intersect/except/limit completeness extras.
  *
  * SQL `UNION` deduplicates; Spark's `union` is UNION ALL — every
  * dedup set-op here pairs `union` with `distinct()` (SURVEY §7.4 O3).
  */
object SetSort {

  /** O1 — multi-key ascending sort (reference `queries.sql:81-83`). */
  private def sortMulti(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderpriority", $"o_orderstatus", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority".asc, $"o_orderstatus".asc, $"o_orderkey".asc)
  }

  /** O2 — descending / mixed-direction sort (reference
    * `queries.sql:151-153`). */
  private def sortDesc(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
  }

  /** O3 — UNION with dedup (reference `pipeline.py:439`). */
  private def unionDistinct(s: SparkSession, d: String) = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
    val sp = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"))
    c.union(sp).distinct().orderBy($"nationkey")
  }

  /** INTERSECT (dedup) — non-reference completeness extra. */
  private def intersectOp(s: SparkSession, d: String) = {
    import s.implicits._
    val ordered = Tables.orders(s, d).select($"o_custkey".as("custkey"))
    val rich = Tables.customer(s, d).filter($"c_acctbal" > 5000.0)
      .select($"c_custkey".as("custkey"))
    ordered.intersect(rich).orderBy($"custkey")
  }

  /** EXCEPT (dedup) — non-reference completeness extra. */
  private def exceptOp(s: SparkSession, d: String) = {
    import s.implicits._
    val all = Tables.customer(s, d).select($"c_custkey".as("custkey"))
    val urgent = Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("custkey"))
    all.except(urgent).orderBy($"custkey")
  }

  /** LIMIT / top-k after a total sort — non-reference extra. The sort
    * is a global order-by; Spark plans it as TakeOrderedAndProject so
    * only k rows ever reach the driver-side collect. */
  private def limitTopK(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("sort_multi", sortMulti _,
      """SELECT o_orderpriority, o_orderstatus, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderpriority ASC, o_orderstatus ASC, o_orderkey ASC""".stripMargin),
    OpDef("sort_desc", sortDesc _,
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin),
    OpDef("union_distinct", unionDistinct _,
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin),
    OpDef("intersect_keys", intersectOp _,
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        |ORDER BY custkey""".stripMargin),
    OpDef("except_keys", exceptOp _,
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin),
    OpDef("limit_topk", limitTopK _,
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin)
  )
}
