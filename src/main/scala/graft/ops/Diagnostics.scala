package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** [EXT] Data-shape diagnostics — the measurements that DRIVE the
  * engine's scale decisions (broadcast vs shuffle, plain vs salted
  * aggregate, AQE skew thresholds), surfaced as a queryable report
  * instead of folklore.
  *
  * Scale design: per analyzed key, one map-side-combined count shuffle
  * (the same cost as the aggregate it advises on) reduced to a single
  * summary row — the whole report is O(#key columns) rows regardless
  * of data size. At 100 TB this is the cheap pre-flight a pipeline
  * runs once per ingest to decide its join strategy, not a per-query
  * cost.
  */
object Diagnostics {

  /** One summary row for a join-key column: key cardinality, the
    * widest key, the interpolated p99 width, mean width, and the
    * max/mean skew ratio (the number that says "salt this key"). */
  private def keyWidthStats(df: DataFrame, keyCol: String,
                            label: String): DataFrame = {
    val widths = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("w"))
    widths
      .agg(count(lit(1)).as("n_keys"), max(col("w")).as("max_width"),
        roundHalfUp(expr("percentile(w, 0.99)"), 6).as("p99_width"),
        (lit(1.0) * sum(col("w")) / count(lit(1))).as("avg_raw"),
        (lit(1.0) * max(col("w")) * count(lit(1)) / sum(col("w"))).as("skew_raw"))
      .select(lit(label).as("join_key"), col("n_keys"), col("max_width"),
        col("p99_width"),
        roundHalfUp(col("avg_raw"), 6).as("avg_width"),
        roundHalfUp(col("skew_raw"), 6).as("skew_ratio"))
  }

  /** Key-width skew report over the engine's join keys. */
  private def diagSkew(s: SparkSession, d: String): DataFrame = {
    keyWidthStats(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey")
      .unionByName(
        keyWidthStats(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
      .unionByName(
        keyWidthStats(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
      .unionByName(
        keyWidthStats(Tables.events(s, d), "user_id", "events.user_id"))
      .orderBy(col("join_key"))
  }

  /** Oracle twin of [[keyWidthStats]] for one (table, key). */
  private def keyStatsSql(table: String, key: String): String =
    s"""SELECT '$table.$key' AS join_key,
       |  COUNT(*) AS n_keys, MAX(w) AS max_width,
       |  ${roundHalfUpSql("quantile_cont(w, 0.99)", 6)} AS p99_width,
       |  ${roundHalfUpSql("1.0 * SUM(w) / COUNT(*)", 6)} AS avg_width,
       |  ${roundHalfUpSql("1.0 * MAX(w) * COUNT(*) / SUM(w)", 6)} AS skew_ratio
       |FROM (SELECT $key, COUNT(*) AS w FROM $table GROUP BY 1)""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("diag_skew", diagSkew _,
      Seq(
        keyStatsSql("lineitem", "l_suppkey"),
        keyStatsSql("lineitem", "l_partkey"),
        keyStatsSql("orders", "o_custkey"),
        keyStatsSql("events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_key"))
  )
}
