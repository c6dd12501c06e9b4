package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.GraftFunctions
import graft.functions.Exact._
import graft.functions.TextFns._

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

  private val EmbDims = 64

  /** Embedding-distribution drift between two ingest batches — the
    * model-monitoring check a training pipeline runs before trusting a
    * new embedding batch. Batches are two deterministic md5-hash
    * halves of `embeddings` (a real pipeline has an ingest-batch
    * column); per label, each half's centroid is the element-wise
    * DECIMAL-exact mean (posexplode, same parity recipe as the k-means
    * trainer), and drift is the cosine between the two half-centroids
    * — 1.0 = stable distribution, lower = the label's embedding cloud
    * moved. Shuffle cost: one (label, half, dim) aggregate — rows ×
    * dims keyed states, map-side combined; the centroid table itself
    * is labels × dims, trivially small at any corpus size. */
  private def diagEmbeddingDrift(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val halves = Tables.embeddings(s, d)
      .select($"vec_id", $"label", $"embedding",
        (hash60(concat(lit("drift:"), $"vec_id".cast("string"))) % 2).as("half"))
    val cents = halves
      .select($"label", $"half", posexplode($"embedding"))
      .groupBy($"label", $"half", $"pos")
      .agg(
        (sum($"col".cast("double").cast("decimal(27,18)")).cast("double") /
          count(lit(1))).as("m"),
        count(lit(1)).as("n"))
      .groupBy($"label", $"half")
      .agg(max($"n").as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("cv"))
    cents.filter($"half" === 0)
      .select($"label", $"n_vecs".as("n_a"), $"cv".as("ca"))
      .join(cents.filter($"half" === 1)
        .select($"label", $"n_vecs".as("n_b"), $"cv".as("cb")), "label")
      .select($"label", $"n_a", $"n_b",
        roundHalfUp(expr("vec_dot(ca, cb)") /
          (sqrt(expr("vec_dot(ca, ca)")) * sqrt(expr("vec_dot(cb, cb)"))), 6)
          .as("drift_cosine"))
      .orderBy($"label")
  }

  private def driftOracle: String = {
    val cos = s"${Similarity.dotSql("a.cv", "b.cv")} / " +
      s"(sqrt(${Similarity.dotSql("a.cv", "a.cv")}) * " +
      s"sqrt(${Similarity.dotSql("b.cv", "b.cv")}))"
    s"""WITH halves AS (
       |  SELECT vec_id, label, embedding,
       |    ${hash60Sql("'drift:' || vec_id")} % 2 AS half
       |  FROM embeddings
       |),
       |m AS (
       |  SELECT label, half, j,
       |    CAST(SUM(CAST(CAST(embedding[j + 1] AS DOUBLE) AS DECIMAL(27,18))) AS DOUBLE)
       |      / COUNT(*) AS m,
       |    COUNT(*) AS n
       |  FROM halves CROSS JOIN range(0, $EmbDims) t(j)
       |  GROUP BY label, half, j
       |),
       |c AS (
       |  SELECT label, half, MAX(n) AS n_vecs, list(m ORDER BY j ASC) AS cv
       |  FROM m GROUP BY label, half
       |)
       |SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
       |  ${roundHalfUpSql(cos, 6)} AS drift_cosine
       |FROM c a JOIN c b ON a.label = b.label AND a.half = 0 AND b.half = 1
       |ORDER BY a.label""".stripMargin
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("diag_embedding_drift", diagEmbeddingDrift _, driftOracle),
    OpDef("diag_skew", diagSkew _,
      Seq(
        keyStatsSql("lineitem", "l_suppkey"),
        keyStatsSql("lineitem", "l_partkey"),
        keyStatsSql("orders", "o_custkey"),
        keyStatsSql("events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_key"))
  )
}
