package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFns.hash60Sql

/** [EXT] Similarity search over `embeddings.embedding: array<float>`.
  *
  * Cosine is computed as an explicit left fold over doubles — Spark
  * `aggregate(zip_with(...))` and DuckDB `list_reduce(list_prepend(0.0,
  * list_transform(list_zip(...))))` perform the identical sequence of
  * IEEE adds/multiplies, so similarities are bit-identical across
  * engines and across cluster re-runs (higher-order functions, not
  * UDFs: no closure shipping, columnar-friendly).
  *
  * Scale design:
  *  - `ann_bruteforce` is the exactness baseline: |Q|×N score pairs,
  *    ranked per query by a window. Correct at any N, cost linear in
  *    N per query — acceptable when Q is small or as the verify pass.
  *  - `ann_lsh` is the scale path: deterministic random-hyperplane
  *    sign bits → one bucket id per vector; candidates = same bucket,
  *    ranked within. The bucket join
  *    shuffles on bucket id instead of exploding Q×N. IVF would swap
  *    the hyperplanes for k-means centroids; the plumbing is the same.
  *  - `dedup_embedding` finds near-duplicate vectors by threshold —
  *    brute force at test scale, with the LSH bucketing as the
  *    documented 100 TB route.
  */
object Similarity {

  // 6 sign bits → ~N/64 candidates per bucket; tune upward as N grows
  // (each extra plane halves expected bucket size).
  private val Planes = 6
  private val Dims = 64
  private val Pow60 = "1152921504606846976.0" // 2^60, hash60 range

  /** Fold-based dot product of two named array columns (as SQL expr). */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  private def normExpr(a: String): String =
    s"sqrt(${dotExpr(a, a)})"

  /** cosine(a, b) over named columns. */
  private def cosineExpr(a: String, b: String): String =
    s"${dotExpr(a, b)} / (${normExpr(a)} * ${normExpr(b)})"

  /** DuckDB twins. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** Near-duplicate vector pairs above a cosine threshold (brute force
    * at test scale; LSH bucketing is the scale path). */
  private def dedupEmbedding(s: SparkSession, d: String) = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val a = e.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.crossJoin(b)
      .filter($"vec_a" < $"vec_b")
      .withColumn("cosine", expr(cosineExpr("ea", "eb")))
      .filter($"cosine" >= 0.4)
      .select($"vec_a", $"vec_b", roundHalfUp($"cosine", 6).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Exact top-5 cosine neighbors for each query vector (vec_id < 20),
    * ranked by a per-query window with deterministic tie-break. */
  private def annBruteforce(s: SparkSession, d: String) = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("ce"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"cand_id".asc)
    q.crossJoin(c)
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine", expr(cosineExpr("qe", "ce")))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"cand_id",
        roundHalfUp($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Deterministic random-hyperplane components: 12 planes × 64 dims,
    * derived from md5 so both engines build identical planes. */
  private def planesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(Planes).toDF("p")
      .withColumn("comps", expr(
        s"transform(sequence(0, ${Dims - 1}), j -> " +
          s"(CAST(${sparkHash60("concat('pl:', p, ':', j)")} AS DOUBLE) / $Pow60) * 2.0 - 1.0)"))
  }

  private def sparkHash60(e: String): String =
    s"cast(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** LSH-bucketed approximate top-3 neighbors: same-bucket candidates
    * only. The per-vector bucket id is 12 hyperplane sign bits. */
  private def annLsh(s: SparkSession, d: String) = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val buckets = e.crossJoin(broadcast(planesDf(s)))
      .withColumn("dot", expr(dotExpr("embedding", "comps")))
      .groupBy($"vec_id")
      .agg(sum(when($"dot" > 0.0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))")).otherwise(0L))
        .as("bucket"))
    val withB = e.join(buckets, "vec_id")
    val q = withB.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"bucket")
    val c = withB
      .select($"vec_id".as("cand_id"), $"embedding".as("ce"), $"bucket")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"cand_id".asc)
    q.join(c, "bucket")
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine", expr(cosineExpr("qe", "ce")))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"query_id", $"rank", $"cand_id",
        roundHalfUp($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  private def planesSql: String =
    s"""planes AS (
       |  SELECT p,
       |    [(CAST(${hash60Sql("'pl:' || p || ':' || j")} AS DOUBLE) / $Pow60) * 2.0 - 1.0
       |     for j in range(0, $Dims)] AS comps
       |  FROM range($Planes) t(p)
       |)""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("dedup_embedding", dedupEmbedding _,
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  CAST(FLOOR((${cosineSql("a.embedding", "b.embedding")}) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin),
    OpDef("ann_bruteforce", annBruteforce _,
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${cosineSql("q.embedding", "c.embedding")} AS cosine
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |),
         |ranked AS (
         |  SELECT query_id, cand_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, CAST(rank AS INT) AS rank, cand_id,
         |  CAST(FLOOR(cosine * 1000000 + 0.5) AS DOUBLE) / 1000000 AS cosine
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin),
    OpDef("ann_lsh", annLsh _,
      s"""WITH $planesSql,
         |buckets AS (
         |  SELECT e.vec_id,
         |    SUM(CASE WHEN ${dotSql("e.embedding", "planes.comps")} > 0.0
         |             THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes
         |  GROUP BY e.vec_id
         |),
         |withb AS (
         |  SELECT e.vec_id, e.embedding, b.bucket
         |  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
         |),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${cosineSql("q.embedding", "c.embedding")} AS cosine
         |  FROM withb q JOIN withb c
         |    ON q.bucket = c.bucket AND q.vec_id < 20 AND q.vec_id <> c.vec_id
         |),
         |ranked AS (
         |  SELECT query_id, cand_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, CAST(rank AS INT) AS rank, cand_id,
         |  CAST(FLOOR(cosine * 1000000 + 0.5) AS DOUBLE) / 1000000 AS cosine
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin)
  )
}
