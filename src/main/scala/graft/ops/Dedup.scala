package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.{GraftFunctions, MinHash}
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Deduplication operators over the `documents` table — the core
  * of a training-data pipeline. Each op is a `queries` entry with a
  * full DuckDB oracle (every signature is md5-derived, so both engines
  * compute bit-identical integers — see [[graft.expressions.MinHash]]).
  *
  * Scale design:
  *  - exact dedup: one shuffle on the content hash; keeps min doc_id
  *    deterministically (never `dropDuplicates`, whose survivor is
  *    partition-order-dependent).
  *  - minhash LSH (words) and n-gram LSH (chars) share one pipeline:
  *    per-row signatures from the codegen'd
  *    [[graft.expressions.MinHashSig]] (one md5 + 16 affine maps per
  *    gram, single pass, no shuffle), band keys explode to B rows per
  *    doc, and candidate generation is a self-join on (band, sig) —
  *    the classic bucket join that scales with bucket sizes, never N².
  *    Exact-Jaccard verification is candidate-scoped and merge-walks
  *    per-doc sorted 60-bit hash arrays (see [[lshPairs]]); the
  *    estimate variant skips gram sets entirely and verifies by
  *    signature agreement.
  *  - simhash: the whole 32-bit signature is computed row-locally by
  *    the codegen'd [[graft.expressions.SimHash32]] (no token explode,
  *    no pre-band shuffle at all); 4×8-bit band join guarantees EXACT
  *    recall for hamming ≤ 3 by pigeonhole, then `bit_count(xor)`
  *    verifies.
  *  - at 100 TB the band self-join shuffles on band signature; hot
  *    buckets (boilerplate docs) are the skew risk — ENFORCED by the
  *    [[Dedup.MaxBucket]] width cap (over-wide buckets are excluded
  *    from candidate generation, mirrored in the oracle), with AQE
  *    skew-join handling the sub-cap spread.
  */
object Dedup {

  private val Bands = 4
  private val RowsPerBand = 4 // Bands × RowsPerBand = MinHash.H

  /** Skew guard for the band self-join: buckets wider than this are
    * dropped from candidate generation. A bucket of width w yields
    * w²/2 pairs from one shuffle partition, so one boilerplate cluster
    * (identical headers/footers across millions of docs) would
    * otherwise turn the bucket join quadratic. Dropping over-wide
    * buckets bounds per-bucket work at MaxBucket²/2 and sacrifices
    * only recall INSIDE pathological clusters — which exact dedup
    * already collapses (identical docs share a content hash). sf0.1's
    * widest bucket is 512, so testdata results are unaffected. */
  private[graft] val MaxBucket = 1024

  /** Gate for broadcasting the candidate doc-id set in [[lshPairs]]:
    * up to this many ids (8 B each ⇒ ≤ ~32 MB) the semi-join against
    * the corpus broadcasts; past it — a dense candidate graph can
    * approach the corpus itself (char-grams over boilerplate-heavy
    * data reach ~27 % of all pairs on the synthetic corpus) — the
    * engine falls back to a shuffled semi-join automatically instead
    * of relying on a manual hint swap. */
  private val BroadcastCandidateLimit = 4L * 1000 * 1000

  // ---------------------------------------------------------------- exact

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

  // ------------------------------------------------- shared LSH pipeline

  /** Width-capped band rows from a (doc_id, sig) frame: band the
    * signature ([[Bands]] × [[RowsPerBand]]) and drop over-wide
    * buckets (the enforced skew guard, see [[MaxBucket]]). */
  private[ops] def bandRows(signed: DataFrame, bands: Int = Bands,
                          rowsPerBand: Int = RowsPerBand): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => col("sig").getItem(b * rowsPerBand + r).cast("string"))
      struct(lit(b).as("band"),
        md5(concat_ws(",", parts: _*)).as("sig")).as(s"band$b")
    }
    signed
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
  }

  private[ops] def keptBands(signed: DataFrame, maxBucket: Int,
                        bands: Int = Bands,
                        rowsPerBand: Int = RowsPerBand): DataFrame = {
    val banded = bandRows(signed, bands, rowsPerBand)
    banded.join(
      banded.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("bw"))
        .filter(col("bw") <= maxBucket)
        .select(col("band"), col("sig")),
      Seq("band", "sig"))
  }

  /** Candidate pairs: [[keptBands]] self-joined on (band, band-sig). */
  private def bandCandidates(signed: DataFrame, maxBucket: Int): DataFrame =
    bandCandidatesGeom(Bands, RowsPerBand)(signed, maxBucket)

  /** Candidate generator with an EXPLICIT band geometry over the same
    * 16-member signature: more bands × fewer rows trades precision
    * for recall at lower Jaccard (P(surface) = 1 − (1 − J^rows)^bands
    * — 4×4 is ~3 % at J = 0.3 where 8×2 is ~53 %, and ~90 % at 0.5).
    * The text family keeps 4×4 (tuned for its 0.8 threshold); the
    * trim-tolerant video near-dup op passes 8×2. */
  private[ops] def bandCandidatesGeom(bands: Int, rowsPerBand: Int)(
      signed: DataFrame, maxBucket: Int): DataFrame = {
    val kept = keptBands(signed, maxBucket, bands, rowsPerBand)
    kept.as("l").join(kept.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** New-batch membership: a deterministic ~10 % md5-hash slice of the
    * corpus stands in for "today's crawl" (same idiom as
    * `sample_hash`; a real pipeline has an ingest-batch column). */
  private[graft] def isNewBatch(docId: Column): Column =
    hash60(concat(lit("inc:"), docId)) % 10 === 0

  /** Cross-batch candidate pairs for incremental dedup: the NEW side's
    * band rows join only the EXISTING side's — no new×new or
    * existing×existing pairs, so candidate work tracks the increment
    * size, not corpus². doc_a = the new-batch doc, doc_b = the
    * existing doc. The width cap counts the WHOLE bucket (both sides),
    * so a boilerplate cluster is excluded no matter how its members
    * split across batches. */
  private[graft] def incrementalCandidates(signed: DataFrame, maxBucket: Int): DataFrame = {
    val kept = keptBands(signed, maxBucket)
    kept.filter(isNewBatch(col("doc_id"))).as("l")
      .join(kept.filter(!isNewBatch(col("doc_id"))).as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Minhash-LSH near-dup pairs: band the [[MinHashSig]] signature of
    * `mkGrams(docs)`, bucket-join for candidates, verify with exact
    * Jaccard over 60-bit gram hashes. Used by both word-shingle and
    * char-n-gram dedup.
    *
    * The verify stage is scoped to CANDIDATE documents only: the
    * candidate id set is broadcast-semi-joined against `docs` BEFORE
    * gram computation, so gram-set construction is proportional to the
    * near-dup population, never the corpus — and gram sets never
    * explode at all: each candidate doc carries ONE sorted hash array
    * (`hash60_set`, built row-local in codegen), and per-pair exact
    * Jaccard is a merge-walk intersection. The corpus itself is
    * touched only by the signature pass (one codegen'd scan, shuffle
    * width = 16 longs per doc). The semi-join broadcasts one long per
    * candidate doc while the candidate count is under
    * [[BroadcastCandidateLimit]], and automatically degrades to a
    * shuffled semi-join past it — no manual hint swap when the
    * candidate graph is dense. Only the two candidate-bounded frames
    * are cached; the harness clears the cache between queries.
    */
  private[graft] def lshPairs(s: SparkSession, docs: DataFrame,
                              mkGrams: DataFrame => DataFrame,
                              threshold: Double,
                              maxBucket: Int = MaxBucket,
                              broadcastLimit: Long = BroadcastCandidateLimit,
                              candidatesOf: (DataFrame, Int) => DataFrame = bandCandidates): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    // A production corpus arrives in many scan partitions; a tiny test
    // file arrives in one, which would serialize the gram+signature
    // compute on a single core. Spread only when under-partitioned —
    // at scale this is a no-op (never a merge).
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val base = mkGrams(spread)
    val signed = base.select($"doc_id", expr("minhash_sig(grams)").as("sig"))
    val candidates = candidatesOf(signed, maxBucket).cache()
    verifyPairs(s, spread, mkGrams, candidates, threshold, broadcastLimit)
  }

  /** Exact-Jaccard verify stage over a candidate-pair frame — the
    * tail every LSH variant shares. Candidate-scoped: docs are
    * semi-joined to the candidate id set BEFORE gram construction
    * (size-gated broadcast), gram sets are one sorted hash array per
    * doc, and per-pair Jaccard is a merge-walk intersection. */
  private def verifyPairs(s: SparkSession, docs: DataFrame,
                          mkGrams: DataFrame => DataFrame,
                          candidates: DataFrame, threshold: Double,
                          broadcastLimit: Long): DataFrame = {
    import s.implicits._
    val candIds = candidates
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    // Size-gated broadcast (see [[BroadcastCandidateLimit]]): the count
    // runs against the already-cached candidate frame, so the gate costs
    // one cheap job, and the fallback path keeps the same semantics with
    // a shuffle on doc_id instead of a driver-collected broadcast.
    val gated =
      if (candIds.count() <= broadcastLimit) broadcast(candIds)
      else candIds
    val candDocs = docs.join(gated, Seq("doc_id"), "left_semi")
    // Gram sets as ONE sorted hash array per candidate doc — built in a
    // single codegen'd pass, no explode/distinct shuffle. Exact Jaccard
    // per pair is then a merge-walk intersection, so verify cost is
    // |candidate pairs| × grams-per-doc ALU work with just two hash
    // joins shipping the arrays — no |pairs|×grams row explosion.
    val gsets = mkGrams(candDocs)
      .select($"doc_id", expr("hash60_set(grams)").as("gs")).cache()

    candidates
      .join(gsets.select($"doc_id".as("doc_a"), $"gs".as("ga")), "doc_a")
      .join(gsets.select($"doc_id".as("doc_b"), $"gs".as("gb")), "doc_b")
      .select($"doc_a", $"doc_b",
        expr("sorted_intersect_count(ga, gb)").as("inter"),
        size($"ga").as("na"), size($"gb").as("nb"))
      .select($"doc_a", $"doc_b",
        roundHalfUp(lit(1.0) * $"inter" / ($"na" + $"nb" - $"inter"), 6)
          .as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Sketch-only near-dup detection: same banded candidates, but
    * "verified" by signature agreement (estimated Jaccard = matching
    * positions / [[MinHash.H]]) instead of exact gram-set Jaccard —
    * the constant-per-doc-size alternative for corpora where even
    * candidate-scoped gram sets are too large to ship. Only the
    * 16-long sketches are cached/joined; est values are dyadic
    * (k/16), so the threshold compare is exact in both engines. */
  private def dedupMinhashEst(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val signed = spread
      .withColumn("words", tokens(col("text")))
      .withColumn("grams", wordShingles("words", 3))
      .filter(size(col("grams")) > 0)
      .select($"doc_id", expr("minhash_sig(grams)").as("sig"))
      .cache()
    bandCandidates(signed, MaxBucket)
      .join(signed.select($"doc_id".as("doc_a"), $"sig".as("sa")), "doc_a")
      .join(signed.select($"doc_id".as("doc_b"), $"sig".as("sb")), "doc_b")
      .select($"doc_a", $"doc_b",
        (expr("vec_match_count(sa, sb)") / lit(MinHash.H.toDouble))
          .as("est_jaccard"))
      .filter($"est_jaccard" >= 0.75)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Split-leakage report — the benchmark-validity audit that runs
    * AFTER `sample_split` assigns train/val/test: a near-dup pair
    * straddling the split boundary silently leaks training text into
    * evaluation (the contamination `text_contamination` catches only
    * for KNOWN benchmarks — this catches it for the pipeline's OWN
    * held-out sets). The EXACT `dedup_minhash` pair set (same grams,
    * bands, caps, 0.8 threshold — spec-reconciled) decorated with
    * each doc's split (the `sample_split` hash rule verbatim, so the
    * report audits exactly the split that op ships) and folded to one
    * row per unordered split pair: pair count, mean Jaccard,
    * `n_eval_docs` = distinct val/test documents touched by the
    * class's pairs (the rows to drop from eval before the numbers
    * can be trusted), `leaky` = the cross-split classes. Hash-by-key
    * splitting prevents RESAMPLING leakage; this measures the
    * remaining NEAR-DUP leakage only dedup can remove.
    *
    * Scale: the pair pipeline is the width-capped LSH the dedup
    * family already bounds; split decoration is two keyed lookups
    * computed row-locally from the doc id (no extra table); both
    * folds are map-side combined onto ≤ 6 rows. */
  private def splitLeakageReport(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val pairs = lshPairs(s, Tables.documents(s, d), wordGrams, 0.8)
    val bucket =
      hash60(concat(lit("split:"), $"doc_id".cast("string"))) % 100
    val splits = Tables.documents(s, d).select($"doc_id",
      when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"))
    val dec = pairs
      .join(splits.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(splits.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .select(least($"sa", $"sb").as("split_a"),
        greatest($"sa", $"sb").as("split_b"),
        $"doc_a", $"doc_b", $"jaccard", $"sa", $"sb")
      .cache() // two folds below walk it
    val agg = dec.groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_pairs"),
        roundHalfUp(sum($"jaccard".cast("decimal(27,6)")).cast("double") /
          count(lit(1)), 6).as("mean_jaccard"))
    val evalDocs = dec
      .select($"split_a", $"split_b", $"doc_a".as("doc"), $"sa".as("sp"))
      .unionByName(dec.select($"split_a", $"split_b",
        $"doc_b".as("doc"), $"sb".as("sp")))
      .filter($"sp" =!= "train")
      .select($"split_a", $"split_b", $"doc").distinct()
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_eval_docs"))
    val out = agg.join(evalDocs, Seq("split_a", "split_b"), "left")
      .select($"split_a", $"split_b", $"n_pairs", $"mean_jaccard",
        coalesce($"n_eval_docs", lit(0L)).as("n_eval_docs"),
        ($"split_a" =!= $"split_b").as("leaky"))
      .orderBy($"split_a", $"split_b")
      // ≤ split-pair-combination rows: eager-checkpoint, then drop the
      // cache so repeated calls don't accumulate blocks (the
      // louvainStepOf convention)
      .localCheckpoint()
    dec.unpersist(false)
    out
  }

  private def splitLeakageOracle: String = {
    val jac = "1.0 * i.inter / (sa.n + sb.n - i.inter)"
    val splitCase =
      s"""CASE WHEN ${hash60Sql("'split:' || doc_id")} % 100 < 90 THEN 'train'
         |     WHEN ${hash60Sql("'split:' || doc_id")} % 100 < 95 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH $shingleCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (
       |  SELECT doc_id, ${MinHash.baseSql("g")} AS b, ${hash60Sql("g")} AS g_h
       |  FROM gx
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |gset AS (SELECT DISTINCT doc_id, g_h FROM gh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN gset a ON a.doc_id = c.doc_a
       |  JOIN gset b ON b.doc_id = c.doc_b AND b.g_h = a.g_h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |pairs AS (
       |  SELECT i.doc_a, i.doc_b, ${roundHalfUpSql(jac, 6)} AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE ${roundHalfUpSql(jac, 6)} >= 0.8
       |),
       |splits AS (SELECT doc_id, $splitCase AS split FROM documents),
       |dec AS (
       |  SELECT LEAST(a.split, b.split) AS split_a,
       |    GREATEST(a.split, b.split) AS split_b,
       |    p.doc_a, p.doc_b, p.jaccard, a.split AS sa, b.split AS sb
       |  FROM pairs p
       |  JOIN splits a ON a.doc_id = p.doc_a
       |  JOIN splits b ON b.doc_id = p.doc_b
       |),
       |agg AS (
       |  SELECT split_a, split_b, COUNT(*) AS n_pairs,
       |    ${roundHalfUpSql(
              "CAST(SUM(CAST(jaccard AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)",
              6)} AS mean_jaccard
       |  FROM dec GROUP BY split_a, split_b
       |),
       |ed AS (
       |  SELECT split_a, split_b, COUNT(*) AS n_eval_docs FROM (
       |    SELECT DISTINCT split_a, split_b, doc FROM (
       |      SELECT split_a, split_b, doc_a AS doc, sa AS sp FROM dec
       |      UNION ALL
       |      SELECT split_a, split_b, doc_b AS doc, sb AS sp FROM dec)
       |    WHERE sp <> 'train')
       |  GROUP BY split_a, split_b
       |)
       |SELECT a.split_a, a.split_b, a.n_pairs, a.mean_jaccard,
       |  CAST(COALESCE(e.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
       |  a.split_a <> a.split_b AS leaky
       |FROM agg a LEFT JOIN ed e
       |  ON e.split_a = a.split_a AND e.split_b = a.split_b
       |ORDER BY a.split_a, a.split_b""".stripMargin
  }

  /** Source-syndication matrix — the mirror-detection artifact web
    * curation reads before setting per-domain caps (the CCNet-shape
    * question "how much of source B is source A reprinted?"): the
    * EXACT `dedup_minhash` near-dup pairs (same grams, bands, caps,
    * 0.8 threshold — spec-reconciled), decorated with each doc's
    * source and folded to one row per unordered source pair with the
    * pair count and mean Jaccard. A heavy cross-source cell says the
    * two feeds syndicate each other (dedup them jointly, cap them as
    * one); a heavy diagonal cell says the source self-duplicates.
    *
    * Scale: the pair pipeline is the width-capped LSH the dedup
    * family already bounds; source decoration joins the pair frame
    * INTO documents on doc_id (two keyed lookups); the fold is
    * map-side combined onto ≤ sources² rows. Mean Jaccard sums the
    * already-6-dp pair values as DECIMAL — partitioning-independent. */
  private def corpusSourceSyndication(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val pairs = lshPairs(s, Tables.documents(s, d), wordGrams, 0.8)
    val src = Tables.documents(s, d).select($"doc_id", $"source")
    pairs
      .join(src.select($"doc_id".as("doc_a"), $"source".as("sa")), "doc_a")
      .join(src.select($"doc_id".as("doc_b"), $"source".as("sb")), "doc_b")
      .select(least($"sa", $"sb").as("source_a"),
        greatest($"sa", $"sb").as("source_b"), $"jaccard")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_pairs"),
        roundHalfUp(sum($"jaccard".cast("decimal(27,6)")).cast("double") /
          count(lit(1)), 6).as("mean_jaccard"))
      .withColumn("cross_source", $"source_a" =!= $"source_b")
      .orderBy($"source_a", $"source_b")
  }

  private def syndicationOracle: String = {
    val jac = "1.0 * i.inter / (sa.n + sb.n - i.inter)"
    s"""WITH $shingleCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (
       |  SELECT doc_id, ${MinHash.baseSql("g")} AS b, ${hash60Sql("g")} AS g_h
       |  FROM gx
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |gset AS (SELECT DISTINCT doc_id, g_h FROM gh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN gset a ON a.doc_id = c.doc_a
       |  JOIN gset b ON b.doc_id = c.doc_b AND b.g_h = a.g_h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |pairs AS (
       |  SELECT i.doc_a, i.doc_b, ${roundHalfUpSql(jac, 6)} AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE ${roundHalfUpSql(jac, 6)} >= 0.8
       |),
       |dec AS (
       |  SELECT LEAST(da.source, db.source) AS source_a,
       |    GREATEST(da.source, db.source) AS source_b, p.jaccard
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b
       |)
       |SELECT source_a, source_b, COUNT(*) AS n_pairs,
       |  ${roundHalfUpSql(
            "CAST(SUM(CAST(jaccard AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)", 6)}
       |    AS mean_jaccard,
       |  source_a <> source_b AS cross_source
       |FROM dec
       |GROUP BY source_a, source_b
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** Sketch-calibration report — the measurement that DECIDES whether
    * the 16-member sketch (`dedup_minhash_est`) can replace the exact
    * verify (`dedup_minhash`) on a given corpus: every banded
    * candidate pair is scored BOTH ways (signature agreement AND exact
    * merge-walk Jaccard), then folded into one row per agreement
    * level k/[[MinHash.H]] — pair count, exact-Jaccard mean/min/max,
    * and how many pairs are true dups at the 0.8 threshold. Reading
    * the curve answers the deployment questions directly: which
    * est-threshold hits the wanted precision, and how wide the
    * exact-Jaccard spread is at each sketch level (widen H if too
    * wide). The dedup analogue of `ann_recall_report`.
    *
    * Scale: candidate generation is the same width-capped band join
    * as every LSH op; the exact side is candidate-scoped (gram sets
    * ship only for candidate docs); the report itself is ≤ H+1 rows.
    * Mean exact-Jaccard is quantized per pair (6 dp) then DECIMAL-
    * summed, so the fold is partitioning-independent (the Exact
    * rationale). */
  private def dedupMinhashEval(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val signed = wordGrams(spread)
      .select($"doc_id", expr("minhash_sig(grams)").as("sig")).cache()
    val candidates = bandCandidates(signed, MaxBucket).cache()
    val candIds = candidates
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val gated =
      if (candIds.count() <= BroadcastCandidateLimit) broadcast(candIds)
      else candIds
    // grams for the exact side re-derive AFTER the candidate semi-join
    // (the verifyPairs convention) — the second tokenize pass touches
    // candidate docs only, never the full corpus
    val gsets = wordGrams(spread.join(gated, Seq("doc_id"), "left_semi"))
      .select($"doc_id", expr("hash60_set(grams)").as("gs")).cache()
    candidates
      .join(signed.select($"doc_id".as("doc_a"), $"sig".as("sa")), "doc_a")
      .join(signed.select($"doc_id".as("doc_b"), $"sig".as("sb")), "doc_b")
      .join(gsets.select($"doc_id".as("doc_a"), $"gs".as("ga")), "doc_a")
      .join(gsets.select($"doc_id".as("doc_b"), $"gs".as("gb")), "doc_b")
      .select(
        expr("vec_match_count(sa, sb)").cast("int").as("est_matches"),
        expr("sorted_intersect_count(ga, gb)").as("inter"),
        size($"ga").as("na"), size($"gb").as("nb"))
      .withColumn("jac6", roundHalfUp(
        lit(1.0) * $"inter" / ($"na" + $"nb" - $"inter"), 6))
      .groupBy($"est_matches")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"jac6" >= 0.8, 1L).otherwise(0L)).as("n_true"),
        roundHalfUp(sum($"jac6".cast("decimal(27,6)")).cast("double") /
          count(lit(1)), 6).as("mean_jaccard"),
        min($"jac6").as("min_jaccard"),
        max($"jac6").as("max_jaccard"))
      .select($"est_matches",
        roundHalfUp($"est_matches" / lit(MinHash.H.toDouble), 6)
          .as("est_jaccard"),
        $"n_pairs", $"n_true", $"mean_jaccard", $"min_jaccard",
        $"max_jaccard")
      .orderBy($"est_matches")
  }

  private def minhashEvalOracle: String = {
    val matches = sigMatchesSql
    val jac = "1.0 * i.inter / (sa.n + sb.n - i.inter)"
    s"""WITH $shingleCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (
       |  SELECT doc_id, ${MinHash.baseSql("g")} AS b, ${hash60Sql("g")} AS g_h
       |  FROM gx
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |gset AS (SELECT DISTINCT doc_id, g_h FROM gh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(bb.g_h) AS inter
       |  FROM cand c
       |  JOIN gset aa ON aa.doc_id = c.doc_a
       |  LEFT JOIN gset bb ON bb.doc_id = c.doc_b AND bb.g_h = aa.g_h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |scored AS (
       |  SELECT CAST($matches AS INT) AS est_matches,
       |    ${roundHalfUpSql(jac, 6)} AS jac6
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  JOIN sigs a ON a.doc_id = i.doc_a
       |  JOIN sigs b ON b.doc_id = i.doc_b
       |)
       |SELECT est_matches,
       |  ${roundHalfUpSql(s"est_matches / ${MinHash.H}.0", 6)} AS est_jaccard,
       |  COUNT(*) AS n_pairs,
       |  CAST(SUM(CASE WHEN jac6 >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |  ${roundHalfUpSql(
            "CAST(SUM(CAST(jac6 AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)", 6)}
       |    AS mean_jaccard,
       |  MIN(jac6) AS min_jaccard,
       |  MAX(jac6) AS max_jaccard
       |FROM scored
       |GROUP BY est_matches
       |ORDER BY est_matches""".stripMargin
  }

  /** `(matching positions)` between sig rows aliased `a` and `b`. */
  private def sigMatchesSql: String = (0 until MinHash.H)
    .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
    .mkString(" + ")

  private def estOracle(gramCte: String, threshold: Double): String = {
    val matches = sigMatchesSql
    s"""WITH $gramCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (
       |  SELECT doc_id, ${MinHash.baseSql("g")} AS b FROM gx
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql
       |SELECT c.doc_a, c.doc_b,
       |  CAST($matches AS BIGINT) / ${MinHash.H}.0 AS est_jaccard
       |FROM cand c
       |JOIN sigs a ON a.doc_id = c.doc_a
       |JOIN sigs b ON b.doc_id = c.doc_b
       |WHERE CAST($matches AS BIGINT) / ${MinHash.H}.0 >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Word-3-shingle minhash near-dups (Jaccard ≥ 0.8). */
  private def dedupMinhash(s: SparkSession, d: String) =
    lshPairs(s, Tables.documents(s, d), wordGrams, 0.8)

  /** The word-3-shingle gram stage `dedup_minhash` and the incremental
    * family share. */
  private[graft] val wordGrams: DataFrame => DataFrame = docs => docs
    .withColumn("words", tokens(col("text")))
    .withColumn("grams", wordShingles("words", 3))
    .filter(size(col("grams")) > 0)
    .select(col("doc_id"), col("grams"))

  /** Char-4-gram Jaccard near-dups (Jaccard ≥ 0.7). */
  private def dedupNgram(s: SparkSession, d: String) = {
    import s.implicits._
    lshPairs(s, Tables.documents(s, d), docs => docs
      .withColumn("norm", normalizeText($"text"))
      .withColumn("grams", charNgrams("norm", 4))
      .filter(size(col("grams")) > 0)
      .select($"doc_id", $"grams"), 0.7)
  }

  /** Incremental near-dup check: word-shingle near-dups of the NEW
    * batch (the [[isNewBatch]] slice) against the EXISTING corpus —
    * the production daily-ingest shape. Same signature/band/verify
    * pipeline as `dedup_minhash`; only candidate generation changes
    * ([[incrementalCandidates]]: cross-batch pairs exclusively), so
    * per-ingest cost tracks the increment. In this catalog entry both
    * sides are derived in-query so the oracle can mirror the whole
    * flow; the PRODUCTION path that persists the existing side's
    * signatures and re-signs only the increment is
    * [[incrementalFromStore]] (spec-proven pair-identical).
    * doc_a = new doc, doc_b = its existing near-duplicate. */
  private def dedupIncremental(s: SparkSession, d: String) =
    lshPairs(s, Tables.documents(s, d), wordGrams, 0.8,
      candidatesOf = incrementalCandidates)

  /** The signature pass alone: the `(doc_id, sig)` frame the
    * incremental pipeline PERSISTS between ingests (a parquet
    * "signature store" — 16 longs per doc, ~128 B, vs re-reading and
    * re-shingling the full corpus text every run). Deterministic
    * (md5-derived minhash), so a stored signature is bit-identical to
    * a recomputed one. */
  private[graft] def signatureStore(s: SparkSession, docs: DataFrame,
                                    mkGrams: DataFrame => DataFrame): DataFrame = {
    GraftFunctions.ensure(s)
    mkGrams(docs).select(col("doc_id"), expr("minhash_sig(grams)").as("sig"))
  }

  /** Incremental near-dup pairs against a PERSISTED signature store —
    * the production daily-ingest shape [[dedupIncremental]] stands in
    * for: `storeSigs` (read from parquet, covering the existing
    * corpus) joins the increment's freshly-computed signatures, so the
    * signature pass runs over the NEW BATCH ONLY — the corpus text is
    * touched exclusively by the candidate-scoped verify stage (a
    * semi-join point-lookup per candidate doc). At 100 TB this is the
    * difference between re-shingling the whole corpus per ingest and
    * an increment-sized map job plus a band join against stored rows.
    * `newBatch` must be exactly the docs NOT covered by the store. */
  private[graft] def incrementalFromStore(s: SparkSession, docs: DataFrame,
                                          newBatch: DataFrame => DataFrame,
                                          storeSigs: DataFrame,
                                          mkGrams: DataFrame => DataFrame,
                                          threshold: Double,
                                          maxBucket: Int = MaxBucket,
                                          broadcastLimit: Long = BroadcastCandidateLimit): DataFrame = {
    GraftFunctions.ensure(s)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val newSigned = signatureStore(s, newBatch(spread), mkGrams)
    val signed = newSigned.unionByName(storeSigs)
    val candidates = incrementalCandidates(signed, maxBucket).cache()
    verifyPairs(s, spread, mkGrams, candidates, threshold, broadcastLimit)
  }

  /** Shared oracle fragments: signature members, band rows, and the
    * width-capped candidate CTEs — identical for the exact-verify and
    * estimate-verify oracles. */
  private def membersSql: String = (0 until MinHash.H)
    .map(i => s"MIN(${MinHash.memberSql(i, "b")}) AS mh$i")
    .mkString(",\n    ")

  private def bandRowsSql(bands: Int = Bands,
                          rowsPerBand: Int = RowsPerBand): String =
    (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => s"CAST(mh${b * rowsPerBand + r} AS VARCHAR)")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', ${parts.mkString(", ")})) AS sig FROM sigs"
    }.mkString("\n  UNION ALL\n  ")

  private def keptSql: String =
    s"""kept AS (
       |  SELECT b.doc_id, b.band, b.sig FROM banded b
       |  JOIN (SELECT band, sig FROM banded GROUP BY band, sig
       |        HAVING COUNT(*) <= $MaxBucket) w
       |    ON b.band = w.band AND b.sig = w.sig
       |)""".stripMargin

  private def keptCandSql: String =
    s"""$keptSql,
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM kept l JOIN kept r
       |    ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
       |)""".stripMargin

  /** Oracle twin of [[incrementalCandidates]]. */
  private def keptIncCandSql: String =
    s"""$keptSql,
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM kept l JOIN kept r
       |    ON l.band = r.band AND l.sig = r.sig
       |  WHERE ${hash60Sql("'inc:' || l.doc_id")} % 10 = 0
       |    AND ${hash60Sql("'inc:' || r.doc_id")} % 10 <> 0
       |)""".stripMargin

  /** Oracle twin of [[lshPairs]]: `gramCte` must define
    * `grams AS (SELECT doc_id, ... AS grams ...)`; `candSql` picks the
    * candidate CTE (self-join default, or cross-batch incremental). */
  private[ops] def lshOracle(gramCte: String, threshold: Double,
                             candSql: String = keptCandSql,
                             bands: Int = Bands,
                             rowsPerBand: Int = RowsPerBand): String = {
    val members = membersSql
    val bandRows = bandRowsSql(bands, rowsPerBand)
    val jac = "1.0 * i.inter / (sa.n + sb.n - i.inter)"
    s"""WITH $gramCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (
       |  SELECT doc_id, ${MinHash.baseSql("g")} AS b, ${hash60Sql("g")} AS g_h
       |  FROM gx
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $members
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  $bandRows
       |),
       |$candSql,
       |gset AS (SELECT DISTINCT doc_id, g_h FROM gh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN gset a ON a.doc_id = c.doc_a
       |  JOIN gset b ON b.doc_id = c.doc_b AND b.g_h = a.g_h
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT i.doc_a, i.doc_b,
       |  ${roundHalfUpSql(jac, 6)} AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE ${roundHalfUpSql(jac, 6)} >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // Containment knobs: rare-gram document-frequency cap (candidate
  // generator), per-doc probe width, and the containment threshold.
  private val ContainDfCap = 64
  private val ContainThreshold = 0.9
  // Probe-side K-selection (round 10): candidate generation joins only
  // each doc's K RAREST kept grams (ordered by global df, then hash —
  // a total order, so both engines select the same set) against the
  // full kept postings, instead of all-kept × all-kept. Pigeonhole
  // bound: a pair with containment ≥ 1 − K/|grams(inner)| has fewer
  // than K unshared inner grams, so at least one of the inner doc's K
  // rarest kept grams is shared and surfaces the pair; full
  // containment (=1.0) pairs are IDENTICAL to the unrestricted
  // generator (if any inner gram clears the df cap, its rarest one
  // does). ContainmentProbeSpec pins shipped == unrestricted on the
  // fixture.
  private val ContainProbeK = 8

  /** ASYMMETRIC near-dup detection: doc A contained in doc B
    * (containment = |grams(A) ∩ grams(B)| / |grams(smaller)| ≥
    * [[ContainThreshold]]) — the quote/snippet/superset case Jaccard
    * dedup structurally misses: a short doc embedded in a long one has
    * LOW Jaccard (small intersection over a big union), so minhash-LSH
    * bands rarely collide for it. Candidates instead come from the
    * inverted index over RARE grams: a contained doc shares ALL its
    * grams with its container, so any shared gram with document
    * frequency ≤ [[ContainDfCap]] surfaces the pair.
    *
    * Scale: gram→doc postings are one explode + distinct shuffle; the
    * df filter drops boilerplate grams, and the probe side keeps only
    * each doc's [[ContainProbeK]] rarest kept grams (WindowGroupLimit
    * top-k, no full sort), bounding the posting join at
    * K × docs × [[ContainDfCap]] instead of Σ df² — the inverted-index
    * analogue of the LSH bucket cap (a gram in every doc generates no
    * candidates, exactly like an over-wide band bucket). The
    * K-selection is exact for containment ≥ 1 − K/|grams(inner)| and
    * provably identical to the unrestricted generator at containment
    * 1.0 (see [[ContainProbeK]]); the oracle mirrors the same
    * selection so the gate stays hash-exact. Verify is the family's
    * standard candidate-scoped merge-walk: one sorted hash array per
    * candidate doc, `sorted_intersect_count` per pair.
    * doc_inner = the smaller gram set (min doc_id on ties). */
  private def dedupContainment(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    // postings feed both the df aggregate and the candidate join —
    // cache the (doc_id, 60-bit hash) pairs so shingling runs once
    // (cleared by the harness between queries). Per-doc dedup is
    // ROW-LOCAL (`hash60_set` = sorted distinct hashes, then explode)
    // — no distinct shuffle over the full posting set; the first
    // exchange these rows pay is the df aggregate's map-side-combined
    // shuffle on gh.
    val postings = wordGrams(spread)
      .select($"doc_id", explode(expr("hash60_set(grams)")).as("gh"))
      .cache()
    val rare = postings.groupBy($"gh").agg(count(lit(1)).as("df"))
      .filter($"df" <= ContainDfCap)
    // kept postings carry the gram's global df so the probe-side
    // K-selection can order by rarity without a second df join
    val keptPost = postings.join(rare, "gh").cache()
    val probe = keptPost
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df".asc, $"gh".asc)))
      .filter($"rk" <= ContainProbeK)
      .select($"doc_id", $"gh")
    val candidates = probe.as("l").join(keptPost.as("r"),
        $"l.gh" === $"r.gh" && $"l.doc_id" =!= $"r.doc_id")
      .select(least($"l.doc_id", $"r.doc_id").as("doc_a"),
        greatest($"l.doc_id", $"r.doc_id").as("doc_b"))
      .distinct().cache()
    val candIds = candidates
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id")).distinct()
    val gsets = wordGrams(spread.join(candIds, Seq("doc_id"), "left_semi"))
      .select($"doc_id", expr("hash60_set(grams)").as("gs")).cache()
    candidates
      .join(gsets.select($"doc_id".as("doc_a"), $"gs".as("ga")), "doc_a")
      .join(gsets.select($"doc_id".as("doc_b"), $"gs".as("gb")), "doc_b")
      .select($"doc_a", $"doc_b",
        expr("sorted_intersect_count(ga, gb)").as("inter"),
        size($"ga").as("na"), size($"gb").as("nb"))
      .select(
        when($"na" < $"nb" || ($"na" === $"nb" && $"doc_a" < $"doc_b"),
          $"doc_a").otherwise($"doc_b").as("doc_inner"),
        when($"na" < $"nb" || ($"na" === $"nb" && $"doc_a" < $"doc_b"),
          $"doc_b").otherwise($"doc_a").as("doc_outer"),
        least($"na", $"nb").cast("long").as("n_inner"),
        roundHalfUp(lit(1.0) * $"inter" / least($"na", $"nb"), 6)
          .as("containment"))
      .filter($"containment" >= ContainThreshold)
      .orderBy($"doc_inner", $"doc_outer")
  }

  private def containmentOracle: String = {
    val score = "1.0 * i.inter / LEAST(sa.n, sb.n)"
    s"""WITH $shingleCte,
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gset AS (SELECT DISTINCT doc_id, ${hash60Sql("g")} AS gh FROM gx),
       |rare AS (
       |  SELECT gh, COUNT(*) AS df FROM gset GROUP BY gh
       |  HAVING COUNT(*) <= $ContainDfCap
       |),
       |kept AS (
       |  SELECT p.doc_id, p.gh, r.df FROM gset p JOIN rare r ON r.gh = p.gh
       |),
       |probe AS (
       |  SELECT doc_id, gh FROM (
       |    SELECT doc_id, gh,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, gh ASC)
       |        AS rk
       |    FROM kept
       |  ) WHERE rk <= $ContainProbeK
       |),
       |cand AS (
       |  SELECT DISTINCT LEAST(l.doc_id, r.doc_id) AS doc_a,
       |    GREATEST(l.doc_id, r.doc_id) AS doc_b
       |  FROM probe l JOIN kept r ON l.gh = r.gh AND l.doc_id <> r.doc_id
       |),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN gset a ON a.doc_id = c.doc_a
       |  JOIN gset b ON b.doc_id = c.doc_b AND b.gh = a.gh
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT
       |  CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.doc_a < i.doc_b)
       |       THEN i.doc_a ELSE i.doc_b END AS doc_inner,
       |  CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND i.doc_a < i.doc_b)
       |       THEN i.doc_b ELSE i.doc_a END AS doc_outer,
       |  LEAST(sa.n, sb.n) AS n_inner,
       |  ${roundHalfUpSql(score, 6)} AS containment
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE ${roundHalfUpSql(score, 6)} >= $ContainThreshold
       |ORDER BY doc_inner, doc_outer""".stripMargin
  }

  private val shingleCte: String =
    s"""grams AS (
       |  SELECT doc_id,
       |    [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)] AS grams
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS words FROM documents)
       |  WHERE len(words) >= 3
       |)""".stripMargin

  private val ngramCte: String =
    s"""grams AS (
       |  SELECT doc_id,
       |    [norm[i:i+3] for i in range(1, len(norm) - 2)] AS grams
       |  FROM (SELECT doc_id, ${normalizeTextSql("text")} AS norm FROM documents)
       |  WHERE len(norm) >= 4
       |)""".stripMargin

  // ---------------------------------------------------------- fuzzy join

  /** Id offset that keeps the corrupted twin's rows distinguishable
    * from the originals inside the shared LSH pipeline (twin id =
    * doc_id + offset; testdata ids are far below it). */
  private val FuzzyOffset = 1000000000L

  /** The corrupted twin corpus for [[joinFuzzyMinhash]]: a
    * deterministic ~20 % md5-hash slice of `documents` with the first
    * word dropped — the "same record, slightly mangled" shape a
    * crawl-vs-recrawl or vendor-feed reconciliation joins against. In
    * production the twin is a second real table; deriving it in-query
    * keeps the whole flow oracle-expressible. */
  private def fuzzyCorpus(docs: DataFrame): DataFrame = {
    val twin = docs
      .filter(hash60(concat(lit("fz:"), col("doc_id"))) % 5 === 0)
      .select((col("doc_id") + FuzzyOffset).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(twin)
  }

  /** Cross-side candidates for the fuzzy join: original band rows join
    * only twin band rows (no orig×orig or twin×twin pairs), so
    * candidate work tracks bucket overlap BETWEEN the tables — the
    * incremental-dedup shape with table membership in place of batch
    * membership. */
  private def fuzzyCandidates(signed: DataFrame, maxBucket: Int): DataFrame = {
    val kept = keptBands(signed, maxBucket)
    kept.filter(col("doc_id") < FuzzyOffset).as("l")
      .join(kept.filter(col("doc_id") >= FuzzyOffset).as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Approximate (minhash) fuzzy JOIN between `documents` and its
    * corrupted twin: word-shingle LSH candidates across the two
    * tables, exact-Jaccard verified ≥ 0.8 — the scalable alternative
    * to a quadratic fuzzy-match join. Same banded pipeline (and the
    * same width cap / broadcast gate) as `dedup_minhash`; only
    * candidate generation is cross-table. Output: each original doc
    * matched to the twin rows it fuzzily joins (`twin_id` is the
    * twin's pre-offset id; a twin also matches near-dups of its
    * source, which is the point of a fuzzy join). */
  private def joinFuzzyMinhash(s: SparkSession, d: String) = {
    import s.implicits._
    lshPairs(s, fuzzyCorpus(Tables.documents(s, d)), wordGrams, 0.8,
      candidatesOf = fuzzyCandidates)
      .select($"doc_a".as("doc_id"), ($"doc_b" - FuzzyOffset).as("twin_id"),
        $"jaccard")
      .orderBy($"doc_id", $"twin_id")
  }

  /** Oracle twin of [[fuzzyCorpus]] + the shared shingle stage: the
    * gram CTE over the original ∪ corrupted-twin corpus. */
  private def fuzzyCte: String =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $FuzzyOffset AS doc_id,
       |    regexp_replace(text, '^\\S+\\s+', '') AS text
       |  FROM documents
       |  WHERE ${hash60Sql("'fz:' || doc_id")} % 5 = 0
       |),
       |grams AS (
       |  SELECT doc_id,
       |    [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)] AS grams
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS words FROM corpus)
       |  WHERE len(words) >= 3
       |)""".stripMargin

  /** Oracle twin of [[fuzzyCandidates]]. */
  private def keptFuzzyCandSql: String =
    s"""$keptSql,
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM kept l JOIN kept r
       |    ON l.band = r.band AND l.sig = r.sig
       |  WHERE l.doc_id < $FuzzyOffset AND r.doc_id >= $FuzzyOffset
       |)""".stripMargin

  // ------------------------------------------------ composed prep pipeline

  /** The training-data prep pipeline, composed from the ops above:
    * quality filter (≥ 5 tokens, ≥ 60 % alphabetic) → exact dedup
    * (content-hash, min-id survivor) → near-dup removal (banded
    * minhash, sketch-estimate ≥ 0.75, drop the larger id of each
    * pair). This is the end-to-end shape a 100 TB corpus-prep job
    * runs: every stage is one scan or one keyed shuffle, the near-dup
    * stage inherits the width-capped banding, and the survivors are
    * deterministic for any partitioning. */
  private def docPrep(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val quality = spread
      .withColumn("norm", normalizeText($"text"))
      .withColumn("w", tokens($"text"))
      .filter(size($"w") >= 5 &&
        length(regexp_replace($"norm", "[^a-z]", "")) * lit(10) >=
          length($"norm") * lit(6))
    val byHash = Window.partitionBy($"content_hash").orderBy($"doc_id".asc)
    val exact = quality
      .withColumn("content_hash", md5($"norm"))
      .withColumn("rn", row_number().over(byHash))
      .filter($"rn" === 1)
      .select($"doc_id", $"content_hash", $"w")
      .cache()
    val signed = exact
      .withColumn("grams", wordShingles("w", 3))
      .filter(size($"grams") > 0)
      .select($"doc_id", expr("minhash_sig(grams)").as("sig"))
      .cache()
    val dropB = bandCandidates(signed, MaxBucket)
      .join(signed.select($"doc_id".as("doc_a"), $"sig".as("sa")), "doc_a")
      .join(signed.select($"doc_id".as("doc_b"), $"sig".as("sb")), "doc_b")
      .filter(expr("vec_match_count(sa, sb)") / lit(MinHash.H.toDouble) >= 0.75)
      .select($"doc_b".as("doc_id")).distinct()
    exact.join(dropB, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"content_hash", size($"w").cast("long").as("n_tokens"))
      .orderBy($"doc_id")
  }

  private def docPrepOracle: String =
    s"""WITH q0 AS (
       |  SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |    ${tokensSql("text")} AS w
       |  FROM documents
       |),
       |quality AS (
       |  SELECT * FROM q0
       |  WHERE len(w) >= 5
       |    AND len(regexp_replace(norm, '[^a-z]', '', 'g')) * 10 >= len(norm) * 6
       |),
       |exact AS (
       |  SELECT doc_id, md5(norm) AS content_hash, w FROM (
       |    SELECT doc_id, norm, w,
       |      ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id ASC) AS rn
       |    FROM quality)
       |  WHERE rn = 1
       |),
       |grams AS (
       |  SELECT doc_id,
       |    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS grams
       |  FROM exact WHERE len(w) >= 3
       |),
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (SELECT doc_id, ${MinHash.baseSql("g")} AS b FROM gx),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |dropb AS (
       |  SELECT DISTINCT c.doc_b AS doc_id
       |  FROM cand c
       |  JOIN sigs a ON a.doc_id = c.doc_a
       |  JOIN sigs b ON b.doc_id = c.doc_b
       |  WHERE CAST($sigMatchesSql AS BIGINT) / ${MinHash.H}.0 >= 0.75
       |)
       |SELECT e.doc_id, e.content_hash, len(e.w) AS n_tokens
       |FROM exact e
       |LEFT JOIN dropb x ON e.doc_id = x.doc_id
       |WHERE x.doc_id IS NULL
       |ORDER BY e.doc_id""".stripMargin

  /** Per-source pipeline observability report: where each document
    * EXITS the prep pipeline — quality gate, exact dedup, near-dup
    * removal, or kept — plus the kept rate. The report a 100 TB
    * corpus-prep run publishes next to its output: data loss is a
    * per-source number someone signs off on, and a source whose kept
    * rate collapses between runs is the first symptom of a bad crawl
    * or a dedup regression.
    *
    * Same stages, constants, and survivor rules as `pipeline_docprep`
    * (quality ≥ 5 tokens & ≥ 60 % alphabetic → content-hash min-id
    * exact dedup → width-capped banded minhash, sketch-estimate ≥ 0.75,
    * drop the larger id). Classification joins the stage frames back
    * on doc_id (ids + small flags only — text never moves again) and
    * the final aggregate is one map-side-combined count onto #sources
    * rows, so the report adds two id-keyed joins to the pipeline it
    * observes. */
  private def dedupReport(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val staged = spread
      .withColumn("norm", normalizeText($"text"))
      .withColumn("w", tokens($"text"))
      .withColumn("q_ok", size($"w") >= 5 &&
        length(regexp_replace($"norm", "[^a-z]", "")) * lit(10) >=
          length($"norm") * lit(6))
    val byHash = Window.partitionBy($"content_hash").orderBy($"doc_id".asc)
    val quality = staged.filter($"q_ok")
      .withColumn("content_hash", md5($"norm"))
      .withColumn("rn", row_number().over(byHash))
      .cache()
    val signed = quality.filter($"rn" === 1)
      .withColumn("grams", wordShingles("w", 3))
      .filter(size($"grams") > 0)
      .select($"doc_id", expr("minhash_sig(grams)").as("sig"))
      .cache()
    val dropB = bandCandidates(signed, MaxBucket)
      .join(signed.select($"doc_id".as("doc_a"), $"sig".as("sa")), "doc_a")
      .join(signed.select($"doc_id".as("doc_b"), $"sig".as("sb")), "doc_b")
      .filter(expr("vec_match_count(sa, sb)") / lit(MinHash.H.toDouble) >= 0.75)
      .select($"doc_b".as("doc_id")).distinct()
    staged.select($"doc_id", $"source", $"q_ok")
      .join(quality.select($"doc_id", $"rn"), Seq("doc_id"), "left")
      .join(dropB.withColumn("nd", lit(true)), Seq("doc_id"), "left")
      .withColumn("status",
        when(!$"q_ok", "quality_fail")
          .when($"rn" > 1, "exact_dup")
          .when($"nd", "near_dup")
          .otherwise("kept"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countWhen($"status" === "quality_fail").as("n_quality_fail"),
        countWhen($"status" === "exact_dup").as("n_exact_dup"),
        countWhen($"status" === "near_dup").as("n_near_dup"),
        countWhen($"status" === "kept").as("n_kept"))
      .withColumn("kept_rate", roundHalfUp(lit(1.0) * $"n_kept" / $"n_docs", 6))
      .orderBy($"source")
  }

  private def dedupReportOracle: String =
    s"""WITH q0 AS (
       |  SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |    ${tokensSql("text")} AS w
       |  FROM documents
       |),
       |quality AS (
       |  SELECT doc_id, norm, w,
       |    ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id ASC) AS rn
       |  FROM q0
       |  WHERE len(w) >= 5
       |    AND len(regexp_replace(norm, '[^a-z]', '', 'g')) * 10 >= len(norm) * 6
       |),
       |exact AS (SELECT doc_id, w FROM quality WHERE rn = 1),
       |grams AS (
       |  SELECT doc_id,
       |    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS grams
       |  FROM exact WHERE len(w) >= 3
       |),
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (SELECT doc_id, ${MinHash.baseSql("g")} AS b FROM gx),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |dropb AS (
       |  SELECT DISTINCT c.doc_b AS doc_id
       |  FROM cand c
       |  JOIN sigs a ON a.doc_id = c.doc_a
       |  JOIN sigs b ON b.doc_id = c.doc_b
       |  WHERE CAST($sigMatchesSql AS BIGINT) / ${MinHash.H}.0 >= 0.75
       |),
       |status AS (
       |  SELECT d.doc_id, d.source,
       |    CASE WHEN q.doc_id IS NULL THEN 'quality_fail'
       |         WHEN q.rn > 1 THEN 'exact_dup'
       |         WHEN x.doc_id IS NOT NULL THEN 'near_dup'
       |         ELSE 'kept' END AS status
       |  FROM documents d
       |  LEFT JOIN quality q ON q.doc_id = d.doc_id
       |  LEFT JOIN dropb x ON x.doc_id = d.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN status = 'quality_fail' THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_fail,
       |  CAST(SUM(CASE WHEN status = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       |  CAST(SUM(CASE WHEN status = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |  CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${roundHalfUpSql(
            "1.0 * SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) / COUNT(*)",
            6)} AS kept_rate
       |FROM status
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** The FULL modern prep chain with per-stage attribution —
    * `dedup_report` upgraded to the round-10 pieces: the LEARNED
    * quality gate (`quality_classifier`'s σ(w·f) keep rule) replaces
    * the hand rule, then content-hash exact dedup, width-capped banded
    * minhash near-dup (sketch-estimate ≥ 0.75), SemDeDup-style
    * semantic dedup (k-means cells + within-cell cosine), and semantic
    * benchmark-contamination flagging — every document exits with ONE
    * attributed status, precedence in pipeline order. The semantic and
    * contamination stages run their standalone corpus-wide rules
    * (each is its own pass in production; attribution, not
    * re-scoping, composes them — so each stage's set reconciles
    * exactly against its standalone op, which the spec checks).
    *
    * Scale: the text stages are the `dedup_report` plan (ids + flags
    * join back on doc_id; text never moves after signing); the vector
    * stages are the `semantic_dedup`/`text_contamination_semantic`
    * plans (row-local assignment, banded probes); the report is one
    * map-side-combined count onto #sources rows. */
  /** Per-document attribution of [[docPrepV2]] (doc_id, source,
    * status) — exposed so the reconciliation spec can check every
    * stage's set against its standalone catalog op. */
  private[graft] def docPrepV2Statuses(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val staged = spread
      .join(Curation.qualityScoreOf(spread).select($"doc_id", $"q_keep"),
        "doc_id")
      .withColumn("norm", normalizeText($"text"))
      .withColumn("w", tokens($"text"))
    val byHash = Window.partitionBy($"content_hash").orderBy($"doc_id".asc)
    val quality = staged.filter($"q_keep")
      .withColumn("content_hash", md5($"norm"))
      .withColumn("rn", row_number().over(byHash))
      .cache()
    val signed = quality.filter($"rn" === 1)
      .withColumn("grams", wordShingles("w", 3))
      .filter(size($"grams") > 0)
      .select($"doc_id", expr("minhash_sig(grams)").as("sig"))
      .cache()
    val dropB = bandCandidates(signed, MaxBucket)
      .join(signed.select($"doc_id".as("doc_a"), $"sig".as("sa")), "doc_a")
      .join(signed.select($"doc_id".as("doc_b"), $"sig".as("sb")), "doc_b")
      .filter(expr("vec_match_count(sa, sb)") / lit(MinHash.H.toDouble) >= 0.75)
      .select($"doc_b".as("doc_id")).distinct()
    val semDrop = Similarity.semanticDropSet(s, d)
      .select($"vec_id".as("doc_id")).withColumn("sd", lit(true))
    val contam = Similarity.contamFlagSet(s, d).withColumn("cf", lit(true))
    staged.select($"doc_id", $"source", $"q_keep")
      .join(quality.select($"doc_id", $"rn"), Seq("doc_id"), "left")
      .join(dropB.withColumn("nd", lit(true)), Seq("doc_id"), "left")
      .join(semDrop, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select($"doc_id", $"source",
        when(!$"q_keep", "classifier_fail")
          .when($"rn" > 1, "exact_dup")
          .when($"nd", "near_dup")
          .when($"sd", "semantic_dup")
          .when($"cf", "contaminated")
          .otherwise("kept").as("status"))
  }

  private def docPrepV2(s: SparkSession, d: String) = {
    import s.implicits._
    docPrepV2Statuses(s, d)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countWhen($"status" === "classifier_fail").as("n_classifier_fail"),
        countWhen($"status" === "exact_dup").as("n_exact_dup"),
        countWhen($"status" === "near_dup").as("n_near_dup"),
        countWhen($"status" === "semantic_dup").as("n_semantic_dup"),
        countWhen($"status" === "contaminated").as("n_contaminated"),
        countWhen($"status" === "kept").as("n_kept"))
      .withColumn("kept_rate", roundHalfUp(lit(1.0) * $"n_kept" / $"n_docs", 6))
      .orderBy($"source")
  }

  private def docPrepV2Oracle: String =
    s"""WITH ${Curation.qualityScoreSql},
       |q0 AS (
       |  SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |    ${tokensSql("text")} AS w
       |  FROM documents
       |),
       |quality AS (
       |  SELECT q0.doc_id, norm, w,
       |    ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY q0.doc_id ASC) AS rn
       |  FROM q0 JOIN qscore qs ON qs.doc_id = q0.doc_id
       |  WHERE qs.q_keep
       |),
       |exact AS (SELECT doc_id, w FROM quality WHERE rn = 1),
       |grams AS (
       |  SELECT doc_id,
       |    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS grams
       |  FROM exact WHERE len(w) >= 3
       |),
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |gh AS (SELECT doc_id, ${MinHash.baseSql("g")} AS b FROM gx),
       |sigs AS (
       |  SELECT doc_id,
       |    $membersSql
       |  FROM gh GROUP BY doc_id
       |),
       |banded AS (
       |  ${bandRowsSql()}
       |),
       |$keptCandSql,
       |dropb AS (
       |  SELECT DISTINCT c.doc_b AS doc_id
       |  FROM cand c
       |  JOIN sigs a ON a.doc_id = c.doc_a
       |  JOIN sigs b ON b.doc_id = c.doc_b
       |  WHERE CAST($sigMatchesSql AS BIGINT) / ${MinHash.H}.0 >= 0.75
       |),
       |${Similarity.normalizedSql},
       |${Similarity.semanticDroppedSql},
       |${Similarity.contamFlaggedSql},
       |status AS (
       |  SELECT d.doc_id, d.source,
       |    CASE WHEN NOT qs.q_keep THEN 'classifier_fail'
       |         WHEN qu.rn > 1 THEN 'exact_dup'
       |         WHEN x.doc_id IS NOT NULL THEN 'near_dup'
       |         WHEN sd.vec_id IS NOT NULL THEN 'semantic_dup'
       |         WHEN cf.doc_id IS NOT NULL THEN 'contaminated'
       |         ELSE 'kept' END AS status
       |  FROM documents d
       |  JOIN qscore qs ON qs.doc_id = d.doc_id
       |  LEFT JOIN quality qu ON qu.doc_id = d.doc_id
       |  LEFT JOIN dropb x ON x.doc_id = d.doc_id
       |  LEFT JOIN semdropped sd ON sd.vec_id = d.doc_id
       |  LEFT JOIN contamflagged cf ON cf.doc_id = d.doc_id
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN status = 'classifier_fail' THEN 1 ELSE 0 END) AS BIGINT) AS n_classifier_fail,
       |  CAST(SUM(CASE WHEN status = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       |  CAST(SUM(CASE WHEN status = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |  CAST(SUM(CASE WHEN status = 'semantic_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_semantic_dup,
       |  CAST(SUM(CASE WHEN status = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${roundHalfUpSql(
            "1.0 * SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) / COUNT(*)",
            6)} AS kept_rate
       |FROM status
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** URL/domain canonicalization dedup — the CCNet-style FIRST stage a
    * web-crawl pipeline runs before any content hashing: collapse
    * scheme/case/`www.`/query/fragment/trailing-slash variants of the
    * same resource to one canonical URL and keep the min-id fetch. The
    * testdata has no URL column, so one is SYNTHESIZED
    * deterministically from (doc_id, source) — the `fn_json_extract`
    * payload pattern — with doc_id-driven variants (scheme flip, host
    * case, trailing slash, utm query, fragment) and a shared path key
    * (doc_id div 5) so canonicalization genuinely collapses groups.
    *
    * Scale: canonicalization is pure row-local regex (codegen'd,
    * zero shuffles); the dedup is ONE window over the canonical key —
    * at 100 TB this is the cheapest stage in the crawl pipeline and
    * runs before text ever ships. Regex parity: all five patterns
    * (`^https?://`, `^([^/?#]+)`, `^www\.`, `[?#].*$`, `/+$`) are
    * anchored single-match expressions with identical semantics in
    * Java regex and DuckDB's RE2 (the `text_pii_scrub` contract);
    * replace-first vs replace-all cannot diverge because each pattern
    * matches at most once. */
  private def dedupUrl(s: SparkSession, d: String) = {
    import s.implicits._
    // Each div-5 block of doc_ids plays five crawls of the SAME
    // resource (host keyed by the block, not the doc), decorated
    // differently per doc — what canonicalization exists to collapse.
    val urls = Tables.documents(s, d)
      .select($"doc_id",
        concat(
          when($"doc_id" % 2 === 0, lit("http://")).otherwise(lit("https://")),
          when($"doc_id" % 3 === 0,
            upper(expr("concat('www.host', CAST((doc_id div 5) % 7 AS STRING), '.com')")))
            .otherwise(expr("concat('www.host', CAST((doc_id div 5) % 7 AS STRING), '.com')")),
          lit("/docs/"), expr("CAST(doc_id div 5 AS STRING)"),
          when($"doc_id" % 4 === 0, lit("/")).otherwise(lit("")),
          when($"doc_id" % 7 === 0, lit("?utm_source=feed")).otherwise(lit("")),
          when($"doc_id" % 11 === 0, lit("#section-2")).otherwise(lit("")))
          .as("url"))
    val w = Window.partitionBy($"canon_url").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    urls
      .withColumn("u0", regexp_replace($"url", "^https?://", ""))
      .withColumn("canon_url", concat(
        regexp_replace(lower(regexp_extract($"u0", "^([^/?#]+)", 1)),
          "^www\\.", ""),
        regexp_replace(
          regexp_replace(regexp_replace($"u0", "^[^/?#]+", ""), "[?#].*$", ""),
          "/+$", "")))
      .withColumn("canonical_id", first($"doc_id").over(w))
      .select($"doc_id", $"url", $"canon_url", $"canonical_id",
        ($"doc_id" === $"canonical_id").cast("long").as("keep"))
      .orderBy($"doc_id")
  }

  private def dedupUrlOracle: String =
    s"""WITH urls AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END) ||
       |    (CASE WHEN doc_id % 3 = 0
       |          THEN upper('www.host' || CAST((doc_id // 5) % 7 AS VARCHAR) || '.com')
       |          ELSE 'www.host' || CAST((doc_id // 5) % 7 AS VARCHAR) || '.com' END) ||
       |    '/docs/' || CAST(doc_id // 5 AS VARCHAR) ||
       |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
       |    (CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed' ELSE '' END) ||
       |    (CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END) AS url
       |  FROM documents
       |),
       |canon AS (
       |  SELECT doc_id, url,
       |    regexp_replace(lower(regexp_extract(u0, '^([^/?#]+)', 1)),
       |      '^www\\.', '') ||
       |    regexp_replace(
       |      regexp_replace(regexp_replace(u0, '^[^/?#]+', ''), '[?#].*$$', ''),
       |      '/+$$', '') AS canon_url
       |  FROM (SELECT doc_id, url,
       |          regexp_replace(url, '^https?://', '') AS u0
       |        FROM urls)
       |)
       |SELECT doc_id, url, canon_url,
       |  FIRST_VALUE(doc_id) OVER (
       |    PARTITION BY canon_url ORDER BY doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       |  ) AS canonical_id,
       |  CAST(doc_id = FIRST_VALUE(doc_id) OVER (
       |    PARTITION BY canon_url ORDER BY doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       |  ) AS BIGINT) AS keep
       |FROM canon
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- simhash

  private val SimBits = 32
  private val SimBands = 4
  private val SimBandBits = SimBits / SimBands
  private val MaxHamming = 3 // < SimBands ⇒ band join is exact by pigeonhole

  /** 32-bit simhash near-dups with hamming ≤ 3 — EXACT result: with 4
    * disjoint 8-bit bands, any pair within hamming 3 shares at least
    * one identical band (pigeonhole), so the band join loses nothing.
    * Signatures come from the row-local [[graft.expressions.SimHash32]]
    * expression (one codegen'd pass per doc — no token explode, no
    * 32-column aggregate, no shuffle before banding); empty token
    * arrays are filtered to match the oracle's unnest semantics.
    * Unordered — the pair op adds the output sort; graph consumers
    * ([[dedupClusters]]) skip it. */
  /** Per-doc 32-bit simhash from text — the 8-byte row a production
    * pipeline PERSISTS as its simhash signature store. */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", expr("simhash32(w)").as("simhash"))
  }

  /** Band rows of a `(doc_id, simhash)` frame — derived ROW-LOCALLY
    * from the 8-byte signature, so a store read needs no text. */
  private[graft] def simBandRows(sim: DataFrame): DataFrame = {
    import sim.sparkSession.implicits._
    val bandCols = (0 until SimBands).map { k =>
      struct(lit(k).as("k"),
        shiftright($"simhash", k * SimBandBits)
          .bitwiseAND(lit((1L << SimBandBits) - 1)).as("v")).as(s"b$k")
    }
    sim
      .select($"doc_id", $"simhash", explode(array(bandCols: _*)).as("b"))
      .select($"doc_id", $"simhash", $"b.k".as("k"), $"b.v".as("v"))
  }

  /** Verified (hamming ≤ [[MaxHamming]]) ordered pairs from one banded
    * frame self-joined — exact by the pigeonhole argument at
    * [[simhashPairs]]. */
  private[graft] def simBandSelfPairs(banded: DataFrame): DataFrame = {
    import banded.sparkSession.implicits._
    banded.as("l").join(banded.as("r"),
        $"l.k" === $"r.k" && $"l.v" === $"r.v" && $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("doc_a"), $"r.doc_id".as("doc_b"),
        bit_count($"l.simhash".bitwiseXOR($"r.simhash")).cast("int")
          .as("hamming"))
      .distinct()
      .filter($"hamming" <= MaxHamming)
  }

  private def simhashPairs(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    simBandSelfPairs(simBandRows(simhashOf(spread)))
  }

  private def dedupSimhash(s: SparkSession, d: String) = {
    import s.implicits._
    simhashPairs(s, d).orderBy($"doc_a", $"doc_b")
  }

  /** All simhash CTEs up to `pairs` — shared by the pair op and the
    * clustering op. */
  private def simhashCtes: String = {
    val bitSums = (0 until SimBits)
      .map(j => s"SUM(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val simExpr = (0 until SimBits)
      .map(j => s"CASE WHEN s$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    val bandRows = (0 until SimBands).map { k =>
      s"SELECT doc_id, simhash, $k AS k, (simhash >> ${k * SimBandBits}) & ${(1L << SimBandBits) - 1} AS v FROM sim"
    }.mkString("\n  UNION ALL\n  ")
    s"""tok0 AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS g FROM documents
       |),
       |tok AS (
       |  SELECT doc_id, ${hash60Sql("g")} AS h FROM tok0
       |),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tok GROUP BY doc_id
       |),
       |sim AS (SELECT doc_id, $simExpr AS simhash FROM bits),
       |banded AS (
       |  $bandRows
       |),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |    CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
       |  FROM banded l JOIN banded r
       |    ON l.k = r.k AND l.v = r.v AND l.doc_id < r.doc_id
       |)""".stripMargin
  }

  private def simhashOracle: String =
    s"""WITH $simhashCtes
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------- clustering

  /** Propagation rounds for near-dup clustering. Both engines run the
    * SAME bounded count, so results agree even on (pathological)
    * components wider than the bound; real near-dup clusters are
    * quasi-cliques of diameter ≤ 2, and every round is two shuffle
    * stages, so the bound is also the latency knob. */
  private val ClusterHops = 4

  /** Near-dup CLUSTERS from the simhash pair graph: bounded min-label
    * propagation (Pregel-style) — each round, every doc takes the
    * minimum cluster id in its closed neighborhood. [[ClusterHops]]
    * rounds of join + min-aggregate, each one shuffle on the edge key;
    * the driver-side loop only chains DataFrames, all data movement is
    * distributed. Output: doc → canonical (minimum) doc id of its
    * cluster, the standard keep-one-per-cluster shape. */
  /** Closed neighborhood (edges both ways + self-loops) of the simhash
    * pair graph, cached — the shared prelude of both clustering
    * variants. */
  private def closedNeighborhood(s: SparkSession, d: String) = {
    import s.implicits._
    // cache the pair frame: everything below derives from it, and an
    // uncached union would run the simhash pipeline once per branch
    val fwd = simhashPairs(s, d)
      .select($"doc_a".as("src"), $"doc_b".as("dst")).cache()
    // symmetrize row-locally (explode), not by unioning two subtrees
    val edges = fwd.select(explode(array(
        struct($"src".as("s"), $"dst".as("t")),
        struct($"dst".as("s"), $"src".as("t")))).as("e"))
      .select($"e.s".as("src"), $"e.t".as("dst"))
    val nodes = edges.select($"src".as("doc_id")).distinct()
    val closed = edges
      .union(nodes.select($"doc_id".as("src"), $"doc_id".as("dst")))
      .cache()
    (closed, nodes)
  }

  /** One min-label propagation round over the closed neighborhood. */
  private def propagate(closed: DataFrame, labels: DataFrame): DataFrame = {
    import closed.sparkSession.implicits._
    closed.join(labels, closed("dst") === labels("doc_id"))
      .groupBy($"src")
      .agg(min($"cluster_id").as("cluster_id"))
      .select($"src".as("doc_id"), $"cluster_id")
  }

  private def dedupClusters(s: SparkSession, d: String) = {
    import s.implicits._
    val (closed, nodes) = closedNeighborhood(s, d)
    var labels = nodes.select($"doc_id", $"doc_id".as("cluster_id"))
    for (_ <- 1 to ClusterHops) labels = propagate(closed, labels)
    labels.orderBy($"doc_id")
  }

  /** Shared persisted cluster-label store (the `ensureLouvainStore`
    * convention): the decorations — `dedup_soft`,
    * `dedup_canonical(_quality)` — each used to re-derive the full
    * pair graph + propagation per call; now the labels are staged
    * once per session and every decoration is ONE keyed join against
    * the store. Each decoration's ORACLE still recomputes the whole
    * derivation from the text, so the hash gate proves store-fed
    * output ≡ live derivation on every driver run; the store content
    * itself is spec-pinned identical to `dedup_clusters`. Rebuilt on
    * each JVM's first call — never trusts a store left by older code. */
  private val ClusterStoreDir = "/tmp/graft_cluster_store"

  private[graft] def ensureClusterStore(s: SparkSession, d: String)
      : String =
    StoreStage.ensure(ClusterStoreDir, d) { tmp =>
      import s.implicits._
      val (closed, nodes) = closedNeighborhood(s, d)
      var labels = nodes.select($"doc_id", $"doc_id".as("cluster_id"))
      for (_ <- 1 to ClusterHops) labels = propagate(closed, labels)
      labels.write.parquet(tmp)
      closed.unpersist(false)
    }

  /** The stored labels (pair-graph docs only, like the live frame). */
  private def storedClusterLabels(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensureClusterStore(s, d))

  /** Bounded min-label propagation over a forward edge list
    * `(src, dst)` — the [[dedupClusters]] pipeline from the pair
    * graph down, reusable against any pair source (the incremental
    * op feeds it the OLD-side pairs as its stored-label stand-in). */
  private[graft] def boundedClusterLabels(fwd: DataFrame): DataFrame = {
    import fwd.sparkSession.implicits._
    val edges = fwd.select(explode(array(
        struct($"src".as("s"), $"dst".as("t")),
        struct($"dst".as("s"), $"src".as("t")))).as("e"))
      .select($"e.s".as("src"), $"e.t".as("dst"))
    val nodes = edges.select($"src".as("doc_id")).distinct()
    val closed = edges
      .union(nodes.select($"doc_id".as("src"), $"doc_id".as("dst")))
      .cache()
    var labels = nodes.select($"doc_id", $"doc_id".as("cluster_id"))
    for (_ <- 1 to ClusterHops) labels = propagate(closed, labels)
    labels
  }

  /** Priority offset separating ADOPTED old-cluster labels from
    * new-doc self-labels in the incremental propagation key: any old
    * label sorts below any new self-label, so cluster ids stay STABLE
    * across ingests regardless of numeric id order — a new doc with a
    * smaller id than an old cluster's min member still adopts the old
    * id (the id downstream stores already reference) instead of
    * relabeling the cluster. Ids must stay below 2^61, the same
    * non-negative bounded-id contract `agg_bitmap_distinct` asserts. */
  private val AdoptBase = 1L << 61

  /** Incremental cluster assignment of an ingest batch against a
    * PERSISTED simhash-signature store and cluster-label store.
    * Candidates: the new batch's band rows (derived row-locally from
    * its fresh 8-byte signatures) join the store's band rows (derived
    * row-locally from STORED signatures — no old text) plus
    * themselves; hamming-verified pairs split into new×old links and
    * the new×new subgraph. Assignment: each new doc's initial key is
    * the MIN stored label over its old neighbors (old singletons count
    * as their own id) tagged below [[AdoptBase]], else its own id
    * tagged above; [[ClusterHops]] rounds of min-propagation over the
    * new×new closed neighborhood spread adoption transitively. Old
    * labels are FROZEN — an ingest never relabels the existing corpus;
    * a new doc whose old neighbors span ≥ 2 stored clusters is a
    * MERGE EVENT the output surfaces as `n_bridged` (the work list a
    * periodic full re-cluster reconciles) rather than silently picking
    * one. Per-ingest cost: sign the increment, one band join against
    * stored rows, a propagation over the increment-sized subgraph —
    * the old graph is never re-propagated. */
  private[graft] def clustersIncrementalCore(
      s: SparkSession, newSim: DataFrame, newDocs: DataFrame,
      storeSim: DataFrame, storeLabels: DataFrame): DataFrame = {
    import s.implicits._
    val nb = simBandRows(newSim).cache() // feeds new×old AND new×new
    val no = nb.as("l")
      .join(simBandRows(storeSim).as("r"),
        $"l.k" === $"r.k" && $"l.v" === $"r.v")
      .select($"l.doc_id".as("n"), $"r.doc_id".as("o"),
        bit_count($"l.simhash".bitwiseXOR($"r.simhash")).cast("int")
          .as("hamming"))
      .distinct()
      .filter($"hamming" <= MaxHamming)
      .select($"n", $"o")
    val oldlink = no.join(
        storeLabels.select($"doc_id".as("o_id"), $"cluster_id".as("s_cluster")),
        $"o" === $"o_id", "left")
      .select($"n", coalesce($"s_cluster", $"o").as("slabel"))
    val adopt = oldlink.groupBy($"n").agg(
        min($"slabel").as("adopt"),
        count(lit(1)).as("n_old_links"),
        countDistinct($"slabel").as("n_bridged"))
      .cache() // feeds the init keys AND the final report columns
    val init = newDocs.join(adopt, newDocs("doc_id") === adopt("n"), "left")
      .select(newDocs("doc_id"),
        coalesce($"adopt", newDocs("doc_id") + lit(AdoptBase))
          .as("cluster_id"))
    val edges = simBandSelfPairs(nb).select(explode(array(
        struct($"doc_a".as("s"), $"doc_b".as("t")),
        struct($"doc_b".as("s"), $"doc_a".as("t")))).as("e"))
      .select($"e.s".as("src"), $"e.t".as("dst"))
    val closed = edges
      .union(newDocs.select($"doc_id".as("src"), $"doc_id".as("dst")))
      .cache()
    var labels = init
    for (_ <- 1 to ClusterHops) labels = propagate(closed, labels)
    labels.join(adopt, labels("doc_id") === adopt("n"), "left")
      .select(labels("doc_id"),
        when($"cluster_id" >= AdoptBase, $"cluster_id" - AdoptBase)
          .otherwise($"cluster_id").as("cluster_id"),
        ($"cluster_id" < AdoptBase).as("adopted"),
        coalesce($"n_old_links", lit(0L)).as("n_old_links"),
        coalesce($"n_bridged", lit(0L)).as("n_bridged"))
      .orderBy($"doc_id")
  }

  /** Incremental near-dup CLUSTER maintenance — the missing third leg
    * of the incremental story (`dedup_incremental` maintains PAIRS,
    * `ann_ivf_incremental`/`lexical_index_merge` maintain indexes;
    * clusters were full-recompute only): the [[isNewBatch]] slice
    * plays today's crawl, the old slice's signatures and bounded-
    * propagation labels stand in for the persisted stores (the
    * `dedup_incremental` convention; IncrementalClustersSpec proves a
    * parquet round-trip of both stores is assignment-identical), and
    * [[clustersIncrementalCore]] assigns every ingested doc a STABLE
    * cluster id with its old-link and bridge counts. */
  private def dedupClustersIncremental(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val target = s.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < target) docs.repartition(target)
      else docs
    val sim = simhashOf(spread).cache() // one signature pass, both sides
    val oldSim = sim.filter(!isNewBatch($"doc_id"))
    val storeLabels = boundedClusterLabels(
      simBandSelfPairs(simBandRows(oldSim))
        .select($"doc_a".as("src"), $"doc_b".as("dst")))
    clustersIncrementalCore(s,
      sim.filter(isNewBatch($"doc_id")),
      spread.filter(isNewBatch($"doc_id")).select($"doc_id"),
      oldSim, storeLabels)
  }

  /** Oracle twin of [[dedupClustersIncremental]]: the full-corpus
    * simhash pair CTEs, split by the ingest hash into the old-side
    * bounded propagation (the stored labels), the new×old adoption
    * fold, and the new-side propagation over [[AdoptBase]]-tagged
    * keys. `vp`/closed-neighborhood/`adopt` CTEs are multi-referenced
    * → MATERIALIZED (the kcore inlining-blowup rule). */
  private def clustersIncOracle: String = {
    val isNewA = s"${hash60Sql("'inc:' || doc_a")} % 10 = 0"
    val isNewB = s"${hash60Sql("'inc:' || doc_b")} % 10 = 0"
    val isNewD = s"${hash60Sql("'inc:' || doc_id")} % 10 = 0"
    val oldRounds = (1 to ClusterHops).map { i =>
      s"""ol$i AS (
         |  SELECT e.src AS doc_id, MIN(l.cluster_id) AS cluster_id
         |  FROM oldclosed e JOIN ol${i - 1} l ON e.dst = l.doc_id
         |  GROUP BY e.src
         |)""".stripMargin
    }.mkString(",\n")
    val newRounds = (1 to ClusterHops).map { i =>
      s"""nl$i AS (
         |  SELECT e.src AS doc_id, MIN(l.ckey) AS ckey
         |  FROM nclosed e JOIN nl${i - 1} l ON e.dst = l.doc_id
         |  GROUP BY e.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $simhashCtes,
       |vp AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM pairs WHERE hamming <= $MaxHamming
       |),
       |oldfwd AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM vp
       |  WHERE NOT ($isNewA) AND NOT ($isNewB)
       |),
       |oldedges AS (
       |  SELECT src, dst FROM oldfwd UNION ALL SELECT dst, src FROM oldfwd
       |),
       |oldnodes AS (SELECT DISTINCT src AS doc_id FROM oldedges),
       |oldclosed AS MATERIALIZED (
       |  SELECT src, dst FROM oldedges
       |  UNION ALL SELECT doc_id, doc_id FROM oldnodes
       |),
       |ol0 AS (SELECT doc_id, doc_id AS cluster_id FROM oldnodes),
       |$oldRounds,
       |newold AS (
       |  SELECT CASE WHEN $isNewA THEN doc_a ELSE doc_b END AS n,
       |         CASE WHEN $isNewA THEN doc_b ELSE doc_a END AS o
       |  FROM vp WHERE ($isNewA) <> ($isNewB)
       |),
       |oldlink AS (
       |  SELECT x.n, COALESCE(s.cluster_id, x.o) AS slabel
       |  FROM newold x LEFT JOIN ol$ClusterHops s ON x.o = s.doc_id
       |),
       |adopt AS MATERIALIZED (
       |  SELECT n, MIN(slabel) AS adopt, COUNT(*) AS n_old_links,
       |    COUNT(DISTINCT slabel) AS n_bridged
       |  FROM oldlink GROUP BY n
       |),
       |newdocs AS (SELECT doc_id FROM documents WHERE $isNewD),
       |nfwd AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM vp
       |  WHERE ($isNewA) AND ($isNewB)
       |),
       |nedges AS (
       |  SELECT src, dst FROM nfwd UNION ALL SELECT dst, src FROM nfwd
       |),
       |nclosed AS MATERIALIZED (
       |  SELECT src, dst FROM nedges
       |  UNION ALL SELECT doc_id, doc_id FROM newdocs
       |),
       |nl0 AS (
       |  SELECT d.doc_id,
       |    CASE WHEN a.adopt IS NOT NULL THEN a.adopt
       |         ELSE d.doc_id + $AdoptBase END AS ckey
       |  FROM newdocs d LEFT JOIN adopt a ON d.doc_id = a.n
       |),
       |$newRounds
       |SELECT l.doc_id,
       |  CASE WHEN l.ckey >= $AdoptBase THEN l.ckey - $AdoptBase
       |       ELSE l.ckey END AS cluster_id,
       |  l.ckey < $AdoptBase AS adopted,
       |  COALESCE(a.n_old_links, 0) AS n_old_links,
       |  COALESCE(a.n_bridged, 0) AS n_bridged
       |FROM nl$ClusterHops l LEFT JOIN adopt a ON l.doc_id = a.n
       |ORDER BY l.doc_id""".stripMargin
  }

  /** Production clustering: iterate min-label propagation TO
    * CONVERGENCE — the exact connected components of the near-dup
    * graph, not a hop-bounded approximation. Each round is the same
    * distributed join + min-aggregate as [[dedupClusters]]; the driver
    * inspects only a changed-label COUNT per round (the standard
    * convergence probe of iterative algorithms — one small action, no
    * data collected), labels are cached per round and unpersisted once
    * superseded, and `maxRounds` bounds pathological chain graphs
    * (rounds needed = graph diameter; real near-dup clusters are
    * quasi-cliques of diameter ≤ 2). Not a catalog entry — unbounded
    * iteration is not a single DuckDB statement — but spec-checked
    * against exact union-find components on the real corpus. */
  private[graft] def clustersConverged(s: SparkSession, d: String,
                                       maxRounds: Int = 50): DataFrame = {
    import s.implicits._
    val (closed, nodes) = closedNeighborhood(s, d)
    var labels = nodes.select($"doc_id", $"doc_id".as("cluster_id")).cache()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val next = propagate(closed, labels).cache()
      changed = next.as("n")
        .join(labels.as("p"), "doc_id")
        .filter($"n.cluster_id" =!= $"p.cluster_id")
        .count()
      labels.unpersist()
      labels = next
      round += 1
    }
    labels.orderBy($"doc_id")
  }

  /** Shared oracle prelude: simhash pairs → bounded label propagation,
    * ending in `l{ClusterHops}(doc_id, cluster_id)`. */
  private def clusterCtes: String = {
    val rounds = (1 to ClusterHops).map { i =>
      s"""l$i AS (
         |  SELECT e.src AS doc_id, MIN(l.cluster_id) AS cluster_id
         |  FROM closed e JOIN l${i - 1} l ON e.dst = l.doc_id
         |  GROUP BY e.src
         |)""".stripMargin
    }.mkString(",\n")
    s"""$simhashCtes,
       |fwd AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE hamming <= $MaxHamming
       |),
       |edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |closed AS (
       |  SELECT src, dst FROM edges
       |  UNION ALL SELECT doc_id, doc_id FROM nodes
       |),
       |l0 AS (SELECT doc_id, doc_id AS cluster_id FROM nodes),
       |$rounds""".stripMargin
  }

  private def clustersOracle: String =
    s"""WITH $clusterCtes
       |SELECT doc_id, cluster_id FROM l$ClusterHops
       |ORDER BY doc_id""".stripMargin

  /** Soft (probabilistic) dedup — the SAMPLING alternative to
    * [[dedupCanonical]]'s hard keep-one: every document keeps with
    * probability 1/|cluster| via the catalog's deterministic hash
    * coin, so each near-dup cluster contributes ONE doc in
    * EXPECTATION while the survivor VARIES across clusters instead of
    * always being the longest member — the soft-dedup knob
    * upsampling-sensitive pipelines prefer when hard dedup would
    * delete legitimate stylistic variants (D4/SlimPajama lineage).
    * Keep rule is integer on both engines: `hash % 10⁶ < 10⁶ div
    * csize` — singletons always keep; a k-cluster keeps each member
    * at ⌊10⁶/k⌋ ppm.
    *
    * Scale: cluster labels cover only pair-graph docs (joined to the
    * corpus by doc_id), sizes are one map-side-combined fold, the
    * coin is row-local — two keyed shuffles total, no text moves. */
  private def dedupSoft(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = storedClusterLabels(s, d)
    val lab = Tables.documents(s, d).select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
    val sizes = lab.groupBy($"cluster_id").agg(count(lit(1)).as("csize"))
    lab.join(sizes, "cluster_id")
      .select($"doc_id", $"cluster_id", $"csize",
        (hash60(concat(lit("soft:"), $"doc_id".cast("string"))) % 1000000L <
          expr("1000000 div csize")).as("keep"))
      .orderBy($"doc_id")
  }

  private def dedupSoftOracle: String =
    s"""WITH $clusterCtes,
       |lab AS (
       |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN l$ClusterHops l ON l.doc_id = d.doc_id
       |),
       |sizes AS (
       |  SELECT cluster_id, COUNT(*) AS csize FROM lab GROUP BY cluster_id
       |)
       |SELECT lab.doc_id, lab.cluster_id, s.csize,
       |  ${hash60Sql("'soft:' || lab.doc_id")} % 1000000
       |    < 1000000 // s.csize AS keep
       |FROM lab JOIN sizes s ON s.cluster_id = lab.cluster_id
       |ORDER BY lab.doc_id""".stripMargin

  /** Canonical-document selection: collapse each near-dup cluster to
    * ONE kept representative — the doc you actually train on — chosen
    * as the longest member (`n_chars` desc, doc_id tie-break), the
    * standard "keep the most complete version" policy. Docs with no
    * near-dup are their own singleton cluster (and trivially kept), so
    * the output covers the whole corpus: `keep` is the final
    * train-set membership flag and `canonical_id` the survivor every
    * dropped dup points at (the provenance link dedup pipelines
    * persist).
    *
    * Scale: the cluster labels cover only docs that appear in a
    * near-dup pair (a small fraction of any real corpus), joined to
    * the corpus by doc_id — one keyed shuffle; the representative is a
    * single `first_value` window over cluster_id (clusters are
    * quasi-cliques, a few docs wide, so no skew), one more keyed
    * shuffle. Nothing here is all-pairs and no text moves — only ids
    * and lengths. */
  private def dedupCanonical(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = storedClusterLabels(s, d)
    val lab = Tables.documents(s, d).select($"doc_id", $"n_chars")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"cluster_id", $"doc_id").as("cluster_id"), $"n_chars")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"n_chars".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lab
      .withColumn("canonical_id", first($"doc_id").over(w))
      .select($"doc_id", $"cluster_id", $"canonical_id",
        ($"doc_id" === $"canonical_id").cast("long").as("keep"))
      .orderBy($"doc_id")
  }

  private def canonicalOracle: String =
    s"""WITH $clusterCtes,
       |lab AS (
       |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       |    d.n_chars
       |  FROM documents d LEFT JOIN l$ClusterHops l ON l.doc_id = d.doc_id
       |),
       |sel AS (
       |  SELECT doc_id, cluster_id,
       |    FIRST_VALUE(doc_id) OVER (
       |      PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       |    ) AS canonical_id
       |  FROM lab
       |)
       |SELECT doc_id, cluster_id, canonical_id,
       |  CAST(doc_id = canonical_id AS BIGINT) AS keep
       |FROM sel
       |ORDER BY doc_id""".stripMargin

  /** Quality-aware canonical selection — the survivor policy real
    * dedup pipelines actually run: within each near-dup cluster keep
    * the member the quality CLASSIFIER scores highest (tie → doc_id),
    * instead of [[dedupCanonical]]'s longest-member proxy. A near-dup
    * of a clean page is often the same text plus boilerplate — longer,
    * but worse; the learned score picks the clean one. Composition of
    * the cluster labels with [[Curation.qualityScoreOf]] (σ(w·f), the
    * same arithmetic the `quality_classifier` gate ships).
    *
    * Scale: identical shape to [[dedupCanonical]] — labels cover only
    * paired docs, one keyed join against per-doc scores (row-local to
    * compute, no text moves), one window per cluster. */
  private def dedupCanonicalQuality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val labels = storedClusterLabels(s, d)
    val lab = Curation.qualityScoreOf(Tables.documents(s, d))
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"cluster_id", $"doc_id").as("cluster_id"), $"q_score")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"q_score".desc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lab
      .withColumn("canonical_id", first($"doc_id").over(w))
      .select($"doc_id", $"cluster_id", $"canonical_id", $"q_score",
        ($"doc_id" === $"canonical_id").cast("long").as("keep"))
      .orderBy($"doc_id")
  }

  private def canonicalQualityOracle: String =
    s"""WITH $clusterCtes,
       |${Curation.qualityScoreSql},
       |lab AS (
       |  SELECT q.doc_id, COALESCE(l.cluster_id, q.doc_id) AS cluster_id,
       |    q.q_score
       |  FROM qscore q LEFT JOIN l$ClusterHops l ON l.doc_id = q.doc_id
       |),
       |sel AS (
       |  SELECT doc_id, cluster_id, q_score,
       |    FIRST_VALUE(doc_id) OVER (
       |      PARTITION BY cluster_id ORDER BY q_score DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       |    ) AS canonical_id
       |  FROM lab
       |)
       |SELECT doc_id, cluster_id, canonical_id, q_score,
       |  CAST(doc_id = canonical_id AS BIGINT) AS keep
       |FROM sel
       |ORDER BY doc_id""".stripMargin

  // Edit-distance fuzzy matching: threshold, k+1 pigeonhole segments
  // over the normalized 40-char prefix key, and the candidate-bucket
  // width cap (same convention as [[MaxBucket]]).
  private val LevK = 2
  private val LevPrefix = 40
  private val MaxLevBucket = 100

  /** Edit-distance near-dup candidates — the character-level member of
    * the dedup family (typo-grade duplicates the token-level
    * MinHash/SimHash ops blur over): document pairs whose normalized
    * [[LevPrefix]]-char prefix keys sit within Levenshtein distance
    * [[LevK]].
    *
    * Scale design: NEVER all-pairs. Pigeonhole blocking splits the key
    * into [[LevK]]+1 fixed segments; ≤ k substitutions can touch at
    * most k segments, so any qualifying pair shares an exact aligned
    * segment — candidates come from a (seg_pos, seg)-keyed bucket
    * self-join (one shuffle), over-wide buckets dropped by
    * [[MaxLevBucket]] exactly like the LSH ops (the cap is mirrored in
    * the oracle, so correctness is tested WITH it). Indel-shifted
    * segments can evade the aligned-segment rule — the documented
    * recall trade of segment blocking (PassJoin-style schemes widen
    * the probe window to recover them). Verification is the
    * band-limited `levenshtein(_, _, k)` — O(k·n) per candidate, not
    * O(n²). */
  private def dedupLevenshtein(s: SparkSession, d: String) =
    dedupLevenshteinOf(Tables.documents(s, d))

  /** Spec hook: [[dedupLevenshtein]] over an arbitrary (doc_id, text)
    * frame, so tests can plant typo pairs and over-wide buckets the
    * testdata never contains. */
  private[graft] def dedupLevenshteinOf(docs: DataFrame,
                                        maxBucket: Int = MaxLevBucket): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val seg1 = LevPrefix / 3
    val keys = docs.select($"doc_id",
      expr(s"substring(regexp_replace(lower(text), '\\\\s+', ' '), 1, $LevPrefix)")
        .as("fkey"))
    val segs = keys.select($"doc_id", $"fkey",
      posexplode(array(
        expr(s"substring(fkey, 1, $seg1)"),
        expr(s"substring(fkey, ${seg1 + 1}, $seg1)"),
        expr(s"substring(fkey, ${2 * seg1 + 1}, ${LevPrefix - 2 * seg1})")))
        .as(Seq("seg_pos", "seg")))
    val ok = segs.groupBy($"seg_pos", $"seg")
      .agg(count(lit(1)).as("w")).filter($"w" <= maxBucket)
      .select($"seg_pos", $"seg")
    val a = segs.join(ok, Seq("seg_pos", "seg"), "left_semi")
      .select($"doc_id".as("doc_id_a"), $"fkey".as("fa"), $"seg_pos", $"seg")
    val b = segs
      .select($"doc_id".as("doc_id_b"), $"fkey".as("fb"), $"seg_pos", $"seg")
    a.join(b, Seq("seg_pos", "seg"))
      .filter($"doc_id_a" < $"doc_id_b")
      .select($"doc_id_a", $"doc_id_b", $"fa", $"fb").distinct()
      .select($"doc_id_a", $"doc_id_b",
        levenshtein($"fa", $"fb", LevK).cast("long").as("distance"))
      .filter($"distance" >= 0)
      .orderBy($"doc_id_a", $"doc_id_b")
  }

  private def levenshteinOracle: String = {
    val seg1 = LevPrefix / 3
    s"""WITH keys AS (
       |  SELECT doc_id,
       |    substring(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, $LevPrefix) AS fkey
       |  FROM documents
       |),
       |segs AS (
       |  SELECT doc_id, fkey, i AS seg_pos,
       |    CASE i WHEN 0 THEN substring(fkey, 1, $seg1)
       |           WHEN 1 THEN substring(fkey, ${seg1 + 1}, $seg1)
       |           ELSE substring(fkey, ${2 * seg1 + 1}, ${LevPrefix - 2 * seg1}) END AS seg
       |  FROM keys CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) t
       |),
       |ok AS (
       |  SELECT seg_pos, seg FROM segs
       |  GROUP BY seg_pos, seg HAVING COUNT(*) <= $MaxLevBucket
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       |    a.fkey AS fa, b.fkey AS fb
       |  FROM segs a
       |  JOIN ok USING (seg_pos, seg)
       |  JOIN segs b ON a.seg_pos = b.seg_pos AND a.seg = b.seg
       |   AND a.doc_id < b.doc_id
       |)
       |SELECT doc_id_a, doc_id_b,
       |  CAST(levenshtein(fa, fb) AS BIGINT) AS distance
       |FROM cand
       |WHERE levenshtein(fa, fb) <= $LevK
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  val defs: Seq[OpDef] = Seq(
    OpDef("dedup_levenshtein", dedupLevenshtein _, levenshteinOracle),
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
    OpDef("dedup_minhash", dedupMinhash _, lshOracle(shingleCte, 0.8)),
    OpDef("dedup_minhash_est", dedupMinhashEst _, estOracle(shingleCte, 0.75)),
    OpDef("dedup_minhash_eval", dedupMinhashEval _, minhashEvalOracle),
    OpDef("split_leakage_report", splitLeakageReport _, splitLeakageOracle),
    OpDef("corpus_source_syndication", corpusSourceSyndication _,
      syndicationOracle),
    OpDef("dedup_ngram", dedupNgram _, lshOracle(ngramCte, 0.7)),
    OpDef("dedup_incremental", dedupIncremental _,
      lshOracle(shingleCte, 0.8, keptIncCandSql)),
    OpDef("join_fuzzy_minhash", joinFuzzyMinhash _,
      s"""SELECT doc_a AS doc_id, doc_b - $FuzzyOffset AS twin_id, jaccard
         |FROM (${lshOracle(fuzzyCte, 0.8, keptFuzzyCandSql)})
         |ORDER BY doc_id, twin_id""".stripMargin),
    OpDef("dedup_containment", dedupContainment _, containmentOracle),
    OpDef("dedup_simhash", dedupSimhash _, simhashOracle),
    OpDef("dedup_clusters", dedupClusters _, clustersOracle),
    OpDef("dedup_clusters_incremental", dedupClustersIncremental _,
      clustersIncOracle),
    OpDef("dedup_canonical", dedupCanonical _, canonicalOracle),
    OpDef("dedup_soft", dedupSoft _, dedupSoftOracle),
    OpDef("dedup_canonical_quality", dedupCanonicalQuality _,
      canonicalQualityOracle),
    OpDef("pipeline_docprep", docPrep _, docPrepOracle),
    OpDef("pipeline_docprep_v2", docPrepV2 _, docPrepV2Oracle),
    OpDef("dedup_url", dedupUrl _, dedupUrlOracle),
    OpDef("dedup_report", dedupReport _, dedupReportOracle)
  )
}
