package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._
import graft.sources.CsvIO

/** Source/sink/staging demonstrations — SURVEY §2.1 (S1-S5).
  *
  * These ops exercise real IO: they round-trip engine tables through
  * the CSV sink + robust scan, and through parquet stage
  * materialization (the reference's CTAS-per-stage pattern,
  * `pipeline.py:45,90,97,…`). Temp paths live under java.io.tmpdir and
  * are overwritten idempotently (S4 `DROP TABLE IF EXISTS` analogue =
  * `SaveMode.Overwrite`).
  */
object Sources {

  private lazy val tmpRoot: String = {
    val p = Files.createTempDirectory("graft_stages_")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** S1+S5 — quoted CSV sink then permissive all-varchar scan; output
    * is the string-typed round trip of `nation`. */
  private def csvRoundtrip(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$tmpRoot/nation_csv"
    CsvIO.writeQuoted(Tables.nation(s, d), path, singleFile = true)
    CsvIO.readRobust(s, path,
        Seq("n_nationkey", "n_name", "n_regionkey"), overflowColumns = 0)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .orderBy($"n_nationkey".cast("int"))
  }

  /** Schema evolution across ingest generations: a v1 stage written
    * with three columns and a v2 stage that ADDED `s_nationkey`, read
    * back together with `mergeSchema` — the widened schema applies
    * retroactively and v1 rows surface NULL for the new column
    * (`COUNT(col)` = 0 on the v1 side proves it). The generation is a
    * partition directory, so at 100 TB each generation's files keep
    * their own physical schema and only footers are reconciled; no
    * rewrite of old data when a column lands. */
  private def scanSchemaEvolution(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$tmpRoot/supplier_evolved"
    Tables.supplier(s, d).select($"s_suppkey", $"s_name", $"s_acctbal")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v=1")
    Tables.supplier(s, d)
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"s_nationkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v=2")
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy($"v")
      .agg(count(lit(1)).as("n_rows"),
        count($"s_nationkey").as("n_with_nation"),
        sumExact($"s_acctbal").as("total_acctbal"))
      .orderBy($"v")
  }

  /** S3/S4 — CTAS-style stage materialization: aggregate → parquet
    * stage → read back → join to a dimension. At scale a materialized
    * stage is a deliberate pipeline breaker reused by several
    * consumers (the reference reads cleaned_applications 3×). */
  private def ctasStage(s: SparkSession, d: String) = {
    import s.implicits._
    val stagePath = s"$tmpRoot/stage_cust_per_nation"
    Tables.customer(s, d)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .write.mode(SaveMode.Overwrite).parquet(stagePath)
    val stage = s.read.parquet(stagePath)
    val nation = Tables.nation(s, d)
    stage.join(broadcast(nation), stage("c_nationkey") === nation("n_nationkey"))
      .select($"n_nationkey", $"n_name", $"n_customers")
      .orderBy($"n_nationkey")
  }

  /** JSONL sink + schema-on-read scan (non-reference extra): typed
    * round trip through line-delimited JSON — doubles survive via
    * shortest-round-trip rendering, dates via ISO strings parsed back
    * by the explicit read schema. */
  private def jsonRoundtrip(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$tmpRoot/orders_json"
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderdate")
      .filter($"o_orderkey" % 100 === 0)
      .write.mode(SaveMode.Overwrite).json(path)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate DATE")
      .json(path)
      .orderBy($"o_orderkey")
  }

  /** Columnar-format round trip through ORC (non-reference extra):
    * the other columnar format a lake ingests alongside parquet —
    * Spark's ORC source is native and vectorized, so the same
    * pushdown/pruning machinery applies. Types (int64/int32, string,
    * double) must survive bit-exact: the oracle reads the ORIGINAL
    * parquet, so the round trip is checked as the identity. */
  private def orcRoundtrip(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$tmpRoot/supplier_orc"
    Tables.supplier(s, d).write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
      .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  /** Hive-style partitioned parquet sink + partition-PRUNED read-back
    * (non-reference extra): orders staged partitioned by order month,
    * then a one-quarter query against the stage. The month filter
    * prunes at the DIRECTORY level (`PartitionFilters` in the scan,
    * never touching other months' files) — the table layout that lets
    * a 100 TB fact table serve a one-month query by listing one
    * directory instead of scanning a year. The read-back declares its
    * schema (partition column included) — no inference, so an empty
    * stage reads as an empty frame and partition values never
    * type-drift. */
  private def sinkPartitioned(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$tmpRoot/orders_by_month"
    Tables.orders(s, d)
      .withColumn("o_month",
        (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("o_month").parquet(path)
    s.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING, " +
        "o_month INT")
      .parquet(path)
      .filter($"o_month".isin(199501, 199502, 199503))
      .groupBy($"o_month", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sumExact($"o_totalprice").as("total_price"))
      .orderBy($"o_month", $"o_orderstatus")
  }

  private val ZBits = 8
  private val ZTile = 256

  /** Bit-interleave `x` and `y` (each [[ZBits]] wide) into a Morton
    * z-value — spelled as a literal sum of shift/mask terms so the
    * SAME text runs as a codegen'd Spark expression and as the DuckDB
    * oracle's integer math. */
  private def zvalSql(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  /** Z-order layout clustering (non-reference extra) — the
    * multi-dimensional file-layout primitive behind OPTIMIZE ZORDER:
    * interleave two dimension keys into a Morton z-value and bucket
    * rows by consecutive z-ranges. Each [[ZTile]]-wide z-range is a
    * 16×16 tile in (x, y) space, so BOTH dimensions' spans stay ≤ 15
    * inside every bucket — the property that lets a reader prune files
    * on min/max stats of EITHER dimension, where a single-column sort
    * clusters one dimension and scatters the other. At 100 TB the
    * z-value is this same row-local integer expression followed by
    * `repartitionByRange(zval)` at write time (each output file = one
    * tile of this query); the op emits the per-tile spans that prove
    * the bound. */
  private def layoutZorder(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(($"l_partkey" % ZTile).cast("int").as("x"),
        ($"l_suppkey" % ZTile).cast("int").as("y"))
      .withColumn("zval", expr(zvalSql("x", "y")))
      .groupBy(expr(s"CAST(zval div $ZTile AS INT)").as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        (max($"x") - min($"x")).as("x_span"),
        (max($"y") - min($"y")).as("y_span"))
      .orderBy($"tile")
  }

  /** S2 — bare parquet scan with projection+predicate pushdown. */
  private def scanParquet(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.supplier(s, d)
      .filter($"s_acctbal" > 0.0)
      .select($"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("layout_zorder", layoutZorder _,
      s"""WITH keyed AS (
         |  SELECT CAST(l_partkey % $ZTile AS INT) AS x,
         |    CAST(l_suppkey % $ZTile AS INT) AS y
         |  FROM lineitem
         |),
         |z AS (SELECT x, y, ${zvalSql("x", "y")} AS zval FROM keyed)
         |SELECT CAST(zval // $ZTile AS INT) AS tile, COUNT(*) AS n_rows,
         |  MAX(x) - MIN(x) AS x_span, MAX(y) - MIN(y) AS y_span
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin),
    OpDef("scan_parquet", scanParquet _,
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE s_acctbal > 0.0 ORDER BY s_suppkey""".stripMargin),
    OpDef("csv_roundtrip", csvRoundtrip _,
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation ORDER BY CAST(n_nationkey AS INT)""".stripMargin),
    OpDef("scan_schema_evolution", scanSchemaEvolution _,
      """SELECT CAST(1 AS INT) AS v, COUNT(*) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_with_nation,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |UNION ALL
        |SELECT CAST(2 AS INT) AS v, COUNT(*) AS n_rows,
        |  COUNT(s_nationkey) AS n_with_nation,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |ORDER BY v""".stripMargin),
    OpDef("ctas_stage", ctasStage _,
      """SELECT n_nationkey, n_name, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name
        |ORDER BY n_nationkey""".stripMargin),
    OpDef("json_roundtrip", jsonRoundtrip _,
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin),
    OpDef("orc_roundtrip", orcRoundtrip _,
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |ORDER BY s_suppkey""".stripMargin),
    OpDef("sink_partitioned", sinkPartitioned _,
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS o_month,
        |  o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE year(o_orderdate) * 100 + month(o_orderdate) IN (199501, 199502, 199503)
        |GROUP BY 1, 2
        |ORDER BY o_month, o_orderstatus""".stripMargin)
  )
}
