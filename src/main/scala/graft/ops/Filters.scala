package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Projections, filters, predicates — SURVEY §2.2 (P1-P12).
  *
  * All predicates here are plain `Column` expressions, so Catalyst
  * pushes them into the parquet scan (`PushedFilters`) and prunes the
  * read schema to the referenced columns — at 100 TB these queries read
  * only the row groups and column chunks they need.
  */
object Filters {

  /** P1 — column-pruning projection (reference `pipeline.py:98-111`). */
  private def project(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** P2 — star + computed columns (reference `pipeline.py:147-158`). */
  private def projectExtend(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .withColumn("revenue", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .withColumn("charge",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")) * (lit(1.0) + $"l_tax"))
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        $"l_discount", $"l_tax", $"revenue", $"charge")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** P4 — null/blank-string test (reference `pipeline.py:93,149`). */
  private def filterNullBlank(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.customer(s, d)
      .filter(!($"c_mktsegment".isNull || trim($"c_mktsegment") === ""))
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** P5 — IN literal list (reference `pipeline.py:155-156`). */
  private def filterInList(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_returnflag".isin("A", "R"))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** P8 — range/comparison predicates incl. BETWEEN and date compare
    * (reference `pipeline.py:153,168-169`). */
  private def filterRange(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.orders(s, d)
      .filter($"o_totalprice".between(1000.0, 5000.0) &&
        $"o_orderdate" >= to_timestamp(lit("1996-01-01")))
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_orderkey")
  }

  /** P9 — regex match predicate (reference `pipeline.py:154,262`). */
  private def filterRegex(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.customer(s, d)
      .filter($"c_name".rlike("^Customer#0+[0-9]*[02468]$"))
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** P10 — compound boolean predicates (reference `queries.sql:105-111`). */
  private def filterCompound(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter(($"l_returnflag" === "R" || $"l_linestatus" === "F") &&
        !($"l_discount" < 0.02) && $"l_quantity" >= 10.0)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_linestatus", $"l_discount", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** P11 — CASE WHEN buckets + NULL-guarded ratio (reference
    * `pipeline.py:164-176` risk_category / loan_to_income_ratio). */
  private def caseWhen(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.customer(s, d)
      .select(
        $"c_custkey",
        $"c_acctbal",
        when($"c_acctbal".isNull, "Unknown")
          .when($"c_acctbal" < 0.0, "Negative")
          .when($"c_acctbal" >= 7500.0, "Excellent")
          .when($"c_acctbal".between(5000.0, 7499.999999), "Good")
          .when($"c_acctbal".between(2500.0, 4999.999999), "Fair")
          .otherwise("Poor").as("balance_tier"),
        when($"c_acctbal".isNull || $"c_acctbal" <= 0.0, null)
          .otherwise(roundHalfUp($"c_acctbal" / lit(10000.0), 4))
          .as("balance_ratio"))
      .orderBy($"c_custkey")
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("project", project _,
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    OpDef("project_extend", projectExtend _,
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
    OpDef("filter_null_blank", filterNullBlank _,
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT (c_mktsegment IS NULL OR TRIM(c_mktsegment) = '')
        |ORDER BY c_custkey""".stripMargin),
    OpDef("filter_in_list", filterInList _,
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    OpDef("filter_range", filterRange _,
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_totalprice BETWEEN 1000.0 AND 5000.0
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin),
    OpDef("filter_regex", filterRegex _,
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '^Customer#0+[0-9]*[02468]$')
        |ORDER BY c_custkey""".stripMargin),
    OpDef("filter_compound", filterCompound _,
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |  l_discount, l_quantity
        |FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        |  AND NOT (l_discount < 0.02) AND l_quantity >= 10.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    OpDef("case_when", caseWhen _,
      """SELECT c_custkey, c_acctbal,
        |  CASE
        |    WHEN c_acctbal IS NULL THEN 'Unknown'
        |    WHEN c_acctbal < 0.0 THEN 'Negative'
        |    WHEN c_acctbal >= 7500.0 THEN 'Excellent'
        |    WHEN c_acctbal BETWEEN 5000.0 AND 7499.999999 THEN 'Good'
        |    WHEN c_acctbal BETWEEN 2500.0 AND 4999.999999 THEN 'Fair'
        |    ELSE 'Poor'
        |  END AS balance_tier,
        |  CASE
        |    WHEN c_acctbal IS NULL OR c_acctbal <= 0.0 THEN NULL
        |    ELSE CAST(FLOOR((c_acctbal / 10000.0) * 10000 + 0.5) AS DOUBLE) / 10000
        |  END AS balance_ratio
        |FROM customer ORDER BY c_custkey""".stripMargin)
  )
}
