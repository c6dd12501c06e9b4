package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.GraftFunctions
import graft.functions.Exact._
import graft.functions.TextFns.hash60Sql

/** [EXT] Similarity search over `embeddings.embedding: array<float>`.
  *
  * Cosine is one codegen'd [[graft.expressions.VecDot]] per pair over
  * PRE-NORMALIZED vectors: each vector is divided by its norm once
  * (O(N) setup), so the pairwise stage — the part that is quadratic in
  * candidates — does a single primitive-double loop per pair instead of
  * the three interpreted higher-order folds round 1 used (45 s → ~1 s
  * at sf0.1 for `dedup_embedding`). The DuckDB oracle mirrors the exact
  * same float→double cast, norm fold, element division, and dot fold,
  * so similarities stay bit-identical across engines.
  *
  * Scale design:
  *  - `ann_bruteforce` is the exactness baseline: |Q|×N score pairs,
  *    ranked per query by a window. Correct at any N, cost linear in N
  *    per query — the verify pass at scale.
  *  - `ann_lsh` is the scale path: deterministic random-hyperplane sign
  *    bits → one bucket id per vector; candidates = same bucket only.
  *    The bucket join shuffles on bucket id instead of exploding Q×N.
  *    IVF would swap the hyperplanes for k-means centroids; the
  *    plumbing is identical.
  *  - `dedup_embedding` finds near-duplicate vectors by threshold —
  *    brute force at test scale, LSH bucketing as the documented
  *    100 TB route.
  */
object Similarity {

  // 6 sign bits → ~N/64 candidates per bucket; tune upward as N grows
  // (each extra plane halves expected bucket size).
  private val Planes = 6
  private val Dims = 64
  private val Pow60 = "1152921504606846976.0" // 2^60, hash60 range

  /** Embeddings with unit-normalized double vectors. The per-row setup
    * (cast, norm, divide) uses higher-order transforms — interpreted,
    * but O(N), never O(N²); the pairwise hot path is [[VecDot]]. */
  private def normalized(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ed"))
      .withColumn("nrm", expr("sqrt(vec_dot(ed, ed))"))
      .select($"vec_id", expr("transform(ed, x -> x / nrm)").as("ne"),
        $"ed")
  }

  /** DuckDB mirror of the strict-left-fold dot product. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(list_zip($a, $b), p -> p[1] * p[2])), " +
      "(acc, x) -> acc + x)"

  /** DuckDB mirror of [[normalized]] as two CTEs (`ed`, `normed`). */
  private def normalizedSql: String =
    s"""ed AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
       |  FROM embeddings
       |),
       |normed AS (
       |  SELECT vec_id, ed,
       |    list_transform(ed, x -> x / sqrt(${dotSql("ed", "ed")})) AS ne
       |  FROM ed
       |)""".stripMargin

  /** Near-duplicate vector pairs above a cosine threshold (brute force
    * at test scale; LSH bucketing is the scale path). */
  private def dedupEmbedding(s: SparkSession, d: String) = {
    import s.implicits._
    val e = normalized(s, d)
    val a = e.select($"vec_id".as("vec_a"), $"ne".as("na"))
    val b = e.select($"vec_id".as("vec_b"), $"ne".as("nb"))
    a.crossJoin(b)
      .filter($"vec_a" < $"vec_b")
      .withColumn("cosine", expr("vec_dot(na, nb)"))
      .filter($"cosine" >= 0.4)
      .select($"vec_a", $"vec_b", roundHalfUp($"cosine", 6).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Exact top-5 cosine neighbors for each query vector (vec_id < 20),
    * ranked by a per-query window with deterministic tie-break. */
  private def annBruteforce(s: SparkSession, d: String) = {
    import s.implicits._
    val e = normalized(s, d)
    val q = e.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"ne".as("nq"))
    val c = e.select($"vec_id".as("cand_id"), $"ne".as("nc"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"cand_id".asc)
    q.crossJoin(c)
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine", expr("vec_dot(nq, nc)"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"cand_id",
        roundHalfUp($"cosine", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Deterministic random-hyperplane components: Planes × Dims,
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
    * only. The per-vector bucket id is `Planes` hyperplane sign bits
    * over the raw double vector (sign is scale-invariant, so raw vs
    * normalized is equivalent — raw avoids any 0-norm edge). */
  private def annLsh(s: SparkSession, d: String) = {
    import s.implicits._
    val e = normalized(s, d)
    val buckets = e.select($"vec_id", $"ed")
      .crossJoin(broadcast(planesDf(s)))
      .withColumn("dot", expr("vec_dot(ed, comps)"))
      .groupBy($"vec_id")
      .agg(sum(when($"dot" > 0.0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))")).otherwise(0L))
        .as("bucket"))
    val withB = e.join(buckets, "vec_id")
    val q = withB.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"ne".as("nq"), $"bucket")
    val c = withB
      .select($"vec_id".as("cand_id"), $"ne".as("nc"), $"bucket")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"cand_id".asc)
    q.join(c, "bucket")
      .filter($"query_id" =!= $"cand_id")
      .withColumn("cosine", expr("vec_dot(nq, nc)"))
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
      s"""WITH $normalizedSql
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${roundHalfUpSql(dotSql("a.ne", "b.ne"), 6)} AS cosine
         |FROM normed a JOIN normed b ON a.vec_id < b.vec_id
         |WHERE ${dotSql("a.ne", "b.ne")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin),
    OpDef("ann_bruteforce", annBruteforce _,
      s"""WITH $normalizedSql,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${dotSql("q.ne", "c.ne")} AS cosine
         |  FROM normed q JOIN normed c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
         |),
         |ranked AS (
         |  SELECT query_id, cand_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, CAST(rank AS INT) AS rank, cand_id,
         |  ${roundHalfUpSql("cosine", 6)} AS cosine
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin),
    OpDef("ann_lsh", annLsh _,
      s"""WITH $normalizedSql,
         |$planesSql,
         |buckets AS (
         |  SELECT e.vec_id,
         |    SUM(CASE WHEN ${dotSql("e.ed", "planes.comps")} > 0.0
         |             THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END) AS bucket
         |  FROM normed e CROSS JOIN planes
         |  GROUP BY e.vec_id
         |),
         |withb AS (
         |  SELECT e.vec_id, e.ne, b.bucket
         |  FROM normed e JOIN buckets b ON e.vec_id = b.vec_id
         |),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    ${dotSql("q.ne", "c.ne")} AS cosine
         |  FROM withb q JOIN withb c
         |    ON q.bucket = c.bucket AND q.vec_id < 20 AND q.vec_id <> c.vec_id
         |),
         |ranked AS (
         |  SELECT query_id, cand_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, CAST(rank AS INT) AS rank, cand_id,
         |  ${roundHalfUpSql("cosine", 6)} AS cosine
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin)
  )
}
