package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Deduplication operators over the `documents` table — the core
  * of a training-data pipeline. Each op is a `queries` entry with a
  * full DuckDB oracle (all signatures are md5-derived, so both engines
  * compute bit-identical integers — see [[graft.functions.TextFns]]).
  *
  * Scale design:
  *  - exact dedup: one shuffle on the content hash; keeps min doc_id
  *    deterministically (never `dropDuplicates`, whose survivor is
  *    partition-order-dependent).
  *  - minhash LSH: signatures are computed per-row with higher-order
  *    functions (no explode of shingles for hashing — a doc with S
  *    shingles costs S×H hash evals inside one row, not S exploded
  *    rows × H). Only band signatures explode (B rows per doc), and
  *    candidate generation is a self-join on (band, signature) — the
  *    classic "bucket join" that scales as the bucket sizes, never as
  *    N². Verification joins shingle sets only for candidate pairs.
  *  - at 100 TB the band self-join shuffles on band signature;
  *    hot buckets (boilerplate docs) are the skew risk — AQE skew-join
  *    handles moderate cases, and the band width R tunes bucket size.
  */
object Dedup {

  private val MinhashH = 16 // hash family size
  private val Bands = 4     // bands × rows-per-band = H
  private val RowsPerBand = 4
  private val JaccardThreshold = 0.8

  /** Exact dedup by content hash; deterministic survivor = min doc_id. */
  private def dedupExact(s: SparkSession, d: String) = {
    import s.implicits._
    val w = Window.partitionBy($"content_hash").orderBy($"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("content_hash", md5(normalizeText($"text")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"content_hash")
      .orderBy($"doc_id")
  }

  /** Documents with per-row minhash signatures and band keys. */
  private def withSignatures(docs: DataFrame): DataFrame = {
    val mh = (0 until MinhashH).map { h =>
      array_min(expr(
        s"transform(shingles, s -> ${lambdaHash60(h, "s")})")).as(s"mh$h")
    }
    val withMh = docs
      .withColumn("words", tokens(col("text")))
      .withColumn("shingles", wordShingles("words", 3))
      .filter(size(col("shingles")) > 0)
      .select(Seq(col("doc_id"), col("shingles")) ++ mh: _*)
    val bandCols = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => col(s"mh${b * RowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", parts: _*)).as("sig")).as(s"band$b")
    }
    withMh.select(col("doc_id"), col("shingles"), array(bandCols: _*).as("bands"))
  }

  /** Spark-side Column-lambda-safe hash60 body for use inside `expr`. */
  private def lambdaHash60(seed: Int, v: String): String =
    s"cast(conv(substring(md5('$seed:' || $v), 1, 15), 16, 10) AS BIGINT)"

  /** Near-dup pairs via minhash + LSH banding + exact-jaccard verify. */
  private def dedupMinhash(s: SparkSession, d: String) = {
    import s.implicits._
    val signed = withSignatures(Tables.documents(s, d)).cache()

    val banded = signed.select($"doc_id", explode($"bands").as("b"))
      .select($"doc_id", $"b.band".as("band"), $"b.sig".as("sig"))
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        $"l.band" === $"r.band" && $"l.sig" === $"r.sig" &&
          $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("doc_a"), $"r.doc_id".as("doc_b"))
      .distinct()

    val shingleSets = signed
      .select($"doc_id", explode($"shingles").as("sh")).distinct().cache()
    val sizes = shingleSets.groupBy($"doc_id").agg(count(lit(1)).as("n"))

    val sa = shingleSets.select($"doc_id".as("doc_a"), $"sh")
    val sb = shingleSets.select($"doc_id".as("doc_b"), $"sh")
    val inter = candidates
      .join(sa, "doc_a").join(sb, Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b",
        roundHalfUp(lit(1.0) * $"inter" / ($"na" + $"nb" - $"inter"), 6)
          .as("jaccard"))
      .filter($"jaccard" >= JaccardThreshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Oracle twin of [[dedupMinhash]] — same hashes, bands, verify. */
  private def minhashOracle: String = {
    val mhExprs = (0 until MinhashH).map { h =>
      s"list_min(list_transform(shingles, s -> ${hash60Sql(h, "s")})) AS mh$h"
    }.mkString(",\n    ")
    val bandRows = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"CAST(mh${b * RowsPerBand + r} AS VARCHAR)")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', ${parts.mkString(", ")})) AS sig FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH docs AS (
       |  SELECT doc_id, ${tokensSql("text")} AS words FROM documents
       |),
       |sh0 AS (
       |  SELECT doc_id,
       |    [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)] AS shingles
       |  FROM docs
       |  WHERE len(words) >= 3
       |),
       |mh AS (
       |  SELECT doc_id, shingles,
       |    $mhExprs
       |  FROM sh0
       |),
       |banded AS (
       |  $bandRows
       |),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
       |),
       |shset AS (
       |  SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM sh0
       |),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN shset a ON a.doc_id = c.doc_a
       |  JOIN shset b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(FLOOR((1.0 * i.inter / (sa.n + sb.n - i.inter)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE CAST(FLOOR((1.0 * i.inter / (sa.n + sb.n - i.inter)) * 1000000 + 0.5) AS DOUBLE) / 1000000 >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("dedup_exact", dedupExact _,
      """WITH hashed AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id ASC) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, content_hash FROM hashed WHERE rn = 1
        |ORDER BY doc_id""".stripMargin),
    OpDef("dedup_minhash", dedupMinhash _, minhashOracle)
  )
}
