package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Joins — SURVEY §2.3 (J1-J5).
  *
  * Scale strategy: dimension tables (region/nation/customer/supplier/
  * part) are broadcast explicitly — at 100 TB the fact side never
  * shuffles for a dim join. Fact-to-fact joins shuffle on the join key
  * and rely on AQE for skew splitting. Semi/anti joins are expressed as
  * `left_semi`/`left_anti` so Catalyst can plan broadcast variants
  * instead of materializing an IN-list.
  */
object Joins {

  /** J1 — left outer equi-join with collision renames and 1-to-many
    * fan-out (reference `pipeline.py:338-384` loan_portfolio). */
  private def joinLeft(s: SparkSession, d: String) = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select($"c_custkey", $"c_name", $"c_mktsegment",
        $"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** Inner equi-join through a broadcast dimension, aggregated — the
    * canonical fact⋈dim shape (non-reference; Spark built-in). */
  private def joinInnerBroadcast(s: SparkSession, d: String) = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n_lines"),
        sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"p_brand")
  }

  /** J2 — cross join of 1-row aggregates (reference `pipeline.py:489-491`). */
  private def joinCross(s: SparkSession, d: String) = {
    val o = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(s, d).agg(count(lit(1)).as("n_lineitems"))
    val c = Tables.customer(s, d).agg(count(lit(1)).as("n_customers"))
    o.crossJoin(l).crossJoin(c)
  }

  /** J3/P6 — left-semi join (`IN (SELECT …)`, reference `pipeline.py:150`). */
  private def semiJoin(s: SparkSession, d: String) = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** J4/P7 — left-anti join (`NOT IN (SELECT …)` with NOT NULL guard,
    * reference `queries.sql:9-17`). */
  private def antiJoin(s: SparkSession, d: String) = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter($"o_orderstatus" === "F")
      .select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Right and full outer joins (non-reference; engine completeness). */
  private def joinFull(s: SparkSession, d: String) = {
    import s.implicits._
    // Suppliers and customers per nation, via outer join of two aggregates.
    val cn = Tables.customer(s, d).groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val sn = Tables.supplier(s, d).groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    cn.join(sn, Seq("nationkey"), "full_outer")
      .select($"nationkey", $"n_customers", $"n_suppliers")
      .orderBy($"nationkey")
  }

  /** Salted skew join (non-reference; the join-side twin of
    * `agg_salted`): every customer row carries one of [[SaltBuckets]]
    * deterministic salts, the nation dim is replicated once per salt,
    * and the join key becomes (nationkey, salt) — a hot key's rows
    * spread over `SaltBuckets` shuffle partitions instead of one. The
    * low-cardinality key (25 nations over all customers) is exactly
    * the hot-key shape; a `shuffle_hash` hint pins the shuffle plan
    * the pattern exists for (first-line tools remain broadcast for
    * broadcastable dims and AQE skew splitting — manual salting is for
    * non-broadcastable dims with keys AQE can't split further, e.g.
    * under outer-join constraints). Result is provably identical to
    * the unsalted join, which is the oracle. */
  private def joinSalted(s: SparkSession, d: String) = {
    import s.implicits._
    val fact = Tables.customer(s, d)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        pmod($"c_custkey", lit(SaltBuckets)).as("salt"))
    val dim = Tables.nation(s, d)
      .select($"n_nationkey", $"n_name",
        explode(array((0 until SaltBuckets).map(lit): _*)).as("salt"))
    fact.join(dim.hint("shuffle_hash"),
        fact("c_nationkey") === dim("n_nationkey") &&
          fact("salt") === dim("salt"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
        sumExact($"c_acctbal").as("total_bal"))
      .orderBy($"n_name")
  }

  private val SaltBuckets = 8

  // Bucketed staging: bucket fan-out and the session-scoped warehouse
  // for the bucketed tables (fresh temp dir per JVM, like Sources).
  private val NBuckets = 8
  private lazy val bucketWarehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_buckets_")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Bucketed co-located fact⋈fact join — the persist-the-partitioning
    * scale primitive: orders and lineitem are staged ONCE as tables
    * bucketed [[NBuckets]]-ways on the join key (`bucketBy` +
    * `sortBy`, one file per bucket via an aligned pre-repartition),
    * after which the join — and the per-order aggregate behind it,
    * which rides the same key — plans with ZERO shuffle on either
    * side (PlanSpec pins one Exchange total: the final total-order
    * sort). At 100 TB this is how a fact⋈fact join avoids re-shuffling
    * both sides on every run: the shuffle is paid at write time and
    * amortized over every later join/aggregation on that key. Staged
    * table names carry a digest of the dataset path and staging runs
    * once per (dataset, JVM): two datasets never alias each other's
    * staged tables, and repeated invocations (benchmark iterations)
    * measure the bucketed join, not the parquet rewrite. The
    * oracle is the plain shuffled join — bucketing must not change a
    * single output row. */
  private def joinBucketed(s: SparkSession, d: String) = {
    import s.implicits._
    s.sql("CREATE DATABASE IF NOT EXISTS graft_buckets " +
      s"LOCATION '$bucketWarehouse'")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    def stage(name: String, df: => DataFrame, key: String): DataFrame = {
      val table = s"graft_buckets.${name}_$tag"
      if (!s.catalog.tableExists(table)) {
        // repartition on the bucket key so each task holds whole buckets
        // (one file per bucket, in-bucket sort preserved)
        df.repartition(NBuckets, col(key))
          .write.mode(SaveMode.Overwrite).format("parquet")
          .bucketBy(NBuckets, key).sortBy(key)
          .saveAsTable(table)
      }
      s.table(table)
    }
    val ord = stage("orders_b", Tables.orders(s, d)
      .select($"o_orderkey", $"o_totalprice"), "o_orderkey")
    val li = stage("lineitem_b", Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity"), "l_orderkey")
    ord.hint("merge").join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        sumExact($"l_quantity").as("sum_qty"),
        max($"o_totalprice").as("order_value"))
      .orderBy($"o_orderkey")
  }

  /** Broadcast Bloom-prefiltered semi join — the explicit form of the
    * runtime-filter pattern (Spark's `InjectRuntimeFilter` applies it
    * only behind internal cost heuristics): the filtered dim keyset
    * aggregates into ONE 128 KiB bitmap ([[graft.expressions.BloomBuild]],
    * bitwise-OR partial merge, so the build shuffles bitmaps, not
    * keys), the bitmap broadcasts to the fact scan, and the codegen'd
    * [[graft.expressions.BloomContains]] probe drops non-matching fact
    * rows MAP-SIDE — before the shuffle semi join that removes the
    * false positives. At 100 TB this is how a fact⋉filtered-dim semi
    * join avoids shuffling the whole fact when the dim is too big to
    * broadcast raw but its bloom is not: the shuffle moves only probe
    * survivors. The exact join makes the result independent of the
    * filter's false-positive rate — the oracle is the plain IN
    * subquery. The exact join is PINNED shuffled (`shuffle_hash`):
    * with a broadcastable dim the bloom would be pointless, and the
    * op exists to demonstrate the non-broadcastable case. */
  private def joinBloomPrefilter(s: SparkSession, d: String) = {
    import s.implicits._
    graft.expressions.GraftFunctions.ensure(s)
    val urgent = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    // the bitmap rides into the probe as a SCALAR SUBQUERY inside a
    // filter on the fact frame itself: a plain 1-row join would let
    // the optimizer push the semi join BELOW the probe (left-semi
    // pushdown), shuffling the unpruned fact — the exact inversion of
    // the pattern. Filters only ever push DOWN, so this stays on the
    // scan side of the exchange. The view name is dataset-keyed
    // (resolution is eager, but two live datasets must never race on
    // one global name).
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val bloomView = s"graft_bloom_urgent_$tag"
    urgent.agg(expr("bloom_build(o_orderkey)").as("bf"))
      .createOrReplaceTempView(bloomView)
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice", $"l_discount")
      .filter(expr(s"bloom_contains((SELECT bf FROM $bloomView), l_orderkey)"))
      .join(urgent.hint("shuffle_hash"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"l_returnflag")
  }

  /** J5 — array → rows via explode (reference `queries.sql:12-14`
    * `UNNEST(problematic_application_ids)`). */
  private def unnestExplode(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.nation(s, d)
      .groupBy($"n_regionkey")
      .agg(array_sort(collect_list($"n_name")).as("names"))
      .select($"n_regionkey", explode($"names").as("n_name"))
      .orderBy($"n_regionkey", $"n_name")
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("join_left", joinLeft _,
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  o.o_orderkey, o.o_orderstatus, o.o_totalprice
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin),
    OpDef("join_inner_broadcast", joinInnerBroadcast _,
      """SELECT p_brand, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    OpDef("join_bloom_prefilter", joinBloomPrefilter _,
      """SELECT l_returnflag, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),
    OpDef("join_cross", joinCross _,
      """SELECT * FROM
        |  (SELECT COUNT(*) AS n_orders FROM orders)
        |  CROSS JOIN (SELECT COUNT(*) AS n_lineitems FROM lineitem)
        |  CROSS JOIN (SELECT COUNT(*) AS n_customers FROM customer)""".stripMargin),
    OpDef("semi_join", semiJoin _,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin),
    OpDef("anti_join", antiJoin _,
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders
        |   WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
        |ORDER BY c_custkey""".stripMargin),
    OpDef("join_full_outer", joinFull _,
      """SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
        |  cn.n_customers, sn.n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |      FROM customer GROUP BY 1) cn
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |      FROM supplier GROUP BY 1) sn
        |ON cn.nationkey = sn.nationkey
        |ORDER BY nationkey""".stripMargin),
    OpDef("join_salted", joinSalted _,
      """SELECT n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
    OpDef("join_bucketed", joinBucketed _,
      """SELECT o.o_orderkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
        |  MAX(o.o_totalprice) AS order_value
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey
        |ORDER BY o.o_orderkey""".stripMargin),
    OpDef("unnest_explode", unnestExplode _,
      """WITH a AS (
        |  SELECT n_regionkey, array_agg(n_name ORDER BY n_name) AS names
        |  FROM nation GROUP BY n_regionkey
        |)
        |SELECT n_regionkey, UNNEST(names) AS n_name FROM a
        |ORDER BY n_regionkey, n_name""".stripMargin)
  )
}
