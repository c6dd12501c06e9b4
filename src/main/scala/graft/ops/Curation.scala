package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Training-data curation operators — the corpus-assembly stages
  * between a filtered document pool and a training run, beyond what
  * `TextAnalysis`/`Corpus` already cover: source-weighted mixing,
  * per-source quality gating, per-domain caps, and the deterministic
  * global shuffle that fixes a training order.
  *
  * Scale design (each op is one codegen'd scan plus at most one keyed
  * shuffle):
  *  - `sample_weighted` is a pure row-local hash-threshold filter —
  *    membership depends only on (doc_id, source), so it is stable
  *    under reruns, repartitioning, and incremental ingest, and the
  *    filter sits directly on the scan (zero shuffle).
  *  - `quality_gate` and `domain_cap` shuffle once on `source` for a
  *    per-source ordered window; rank arithmetic is integer-only, so
  *    both engines agree bit-for-bit. A pathological mega-source at
  *    100 TB takes the same salting treatment as `agg_salted` (cap
  *    per (source, salt) then merge) — noted, not needed at testdata
  *    skew.
  *  - `corpus_shuffle` is the epoch-order primitive: shard by key
  *    hash, order within shard by the same hash — one shuffle on the
  *    shard id, and every shard's file is written independently, so a
  *    1000-executor cluster materializes the whole epoch in parallel.
  *    A new epoch order is a new seed string, not a new algorithm.
  */
object Curation {

  // Source-mixing schedule: permille of each source kept when
  // assembling the training pool. Deterministic stand-in for the
  // usual "web down-weighted, curated sources kept whole" config;
  // sources not named get the catch-all default rate.
  private val MixPermille: Seq[(String, Int)] =
    (0 to 9).map(i => s"src$i" -> (1000 - i * 75))
  private val DefaultPermille = 500

  /** Source-weighted corpus mixing: keep each document with its
    * source's configured probability, decided by a keyed hash
    * threshold rather than `rand()` — the data-mixing primitive for
    * hitting target domain proportions. Sources outside the schedule
    * take [[DefaultPermille]]. */
  /** Exact proportional stratified sample: every language stratum
    * contributes ceil(10 % of its docs) — EXACT counts, unlike the
    * Bernoulli [[sampleWeighted]] whose per-stratum yield is binomial.
    * Selection within a stratum is the deterministic md5-hash order
    * (reproducible on any cluster / rerun, oracle-mirrored).
    *
    * Scale: per-stratum counts are a map-side-combined aggregate onto
    * #langs rows, broadcast back; the rank is one lang-keyed window
    * whose rank-filter plans as WindowGroupLimit ONLY under a constant
    * cap — a variable quota disables the pushdown, so the window here
    * ranks the full stratum but still rides a single keyed shuffle.
    * Strata wider than a partition would salt exactly like
    * `domain_cap_salted` (two-stage quota split). */
  private def sampleStratified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pri = hash60(concat(lit("strat:"), $"doc_id".cast("string")))
    val w = Window.partitionBy($"lang").orderBy(pri.asc, $"doc_id".asc)
    val quotas = Tables.documents(s, d).groupBy($"lang")
      .agg(ceil(count(lit(1)) / lit(10.0)).cast("long").as("quota"))
    Tables.documents(s, d)
      .select($"doc_id", $"lang")
      .withColumn("strat_rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "lang")
      .filter($"strat_rank" <= $"quota")
      .select($"doc_id", $"lang", $"strat_rank", $"quota")
      .orderBy($"doc_id")
  }

  private val ReservoirK = 500

  /** Exact-K deterministic global sample — the distributed reservoir:
    * rank every doc by a keyed md5 priority and keep the K smallest.
    * `orderBy(pri).limit(K)` plans as TakeOrderedAndProject: each
    * partition keeps a local top-K and the driver merges P×K candidate
    * rows — no global sort, no corpus shuffle, and the SAME K rows
    * come back under any partitioning or ingest order (the
    * reproducibility `TABLESAMPLE`/`rand()` reservoirs lack, and the
    * exact-count guarantee `sample_hash`'s Bernoulli filter lacks).
    * K bounds driver memory; for K beyond driver comfort, pre-filter
    * per partition by rank first (the `domain_cap` shape). */
  private def sampleReservoir(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        hash60(concat(lit("rsv:"), $"doc_id".cast("string"))).as("pri"))
      .orderBy($"pri".asc, $"doc_id".asc)
      .limit(ReservoirK)
      .orderBy($"doc_id")
  }

  // Sampling temperature for source re-balancing (the multilingual-
  // corpus convention: q_i ∝ p_i^α flattens head sources, α < 1).
  private val MixAlpha = 0.7

  /** Temperature-scaled source mixing weights — the `q_i ∝ n_i^α`
    * schedule (α = [[MixAlpha]]) that up-weights tail sources when
    * assembling a training mix, reported as per-source weight and the
    * expected document budget at the current corpus size.
    *
    * Scale: per-source counts are one map-side-combined aggregate onto
    * #sources rows; everything after operates on that tiny frame (the
    * normalizing total rides in as a 1-row broadcast). Cross-engine
    * determinism: n^α evaluates as exp(α·ln n) with each transcendental
    * step quantized to 9 dp (the kit's ln/exp recipe), the normalizer
    * sums those quantized terms as exact DECIMAL(27,18), and weights
    * quantize to 6 dp before the budget rounds half-up. */
  private def corpusTemperatureMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    temperatureMixOf(Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("n_docs")))
  }

  /** Spec hook: the α-schedule over an arbitrary (source, n_docs)
    * count frame, so tests can feed skew the uniform testdata lacks. */
  private[graft] def temperatureMixOf(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val t = counts.withColumn("t",
      roundHalfUp(exp(roundHalfUp(lit(MixAlpha) *
        roundHalfUp(log($"n_docs"), 9), 9)), 9))
    val tot = t.agg(
      sum($"t".cast("decimal(27,18)")).cast("double").as("tt"),
      sum($"n_docs").as("n_total"))
    t.crossJoin(broadcast(tot))
      .withColumn("weight", roundHalfUp($"t" / $"tt", 6))
      .select($"source", $"n_docs", $"weight",
        floor($"weight" * $"n_total" + lit(0.5)).cast("long")
          .as("expected_docs"))
      .orderBy($"source")
  }

  private def temperatureMixOracle: String =
    s"""WITH counts AS (
       |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
       |),
       |t AS (
       |  SELECT source, n_docs,
       |    ${roundHalfUpSql(
          s"exp(${roundHalfUpSql(
            s"$MixAlpha * ${roundHalfUpSql("ln(n_docs)", 9)}", 9)})", 9)} AS t
       |  FROM counts
       |),
       |tot AS (
       |  SELECT CAST(SUM(CAST(t AS DECIMAL(27,18))) AS DOUBLE) AS tt,
       |    CAST(SUM(n_docs) AS BIGINT) AS n_total
       |  FROM t
       |)
       |SELECT source, n_docs, ${roundHalfUpSql("t / tt", 6)} AS weight,
       |  CAST(FLOOR(${roundHalfUpSql("t / tt", 6)} * n_total + 0.5) AS BIGINT)
       |    AS expected_docs
       |FROM t CROSS JOIN tot
       |ORDER BY source""".stripMargin

  private def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val permille = MixPermille.foldLeft(lit(DefaultPermille)) {
      case (acc, (src, pm)) => when($"source" === src, pm).otherwise(acc)
    }
    Tables.documents(s, d)
      .withColumn("mix_permille", permille.cast("long"))
      .filter(hash60(concat(lit("mix:"), $"doc_id".cast("string"))) % 1000 <
        $"mix_permille")
      .select($"doc_id", $"source", $"mix_permille")
      .orderBy($"doc_id")
  }

  /** Per-source quality gate: drop the bottom quartile of each source
    * by quality score (the alpha-character ratio `text_quality` also
    * uses), ranked with a deterministic doc_id tie-break. Rank-based
    * rather than quantile-threshold-based ON PURPOSE: the cut is
    * integer arithmetic on ranks, immune to the engine-specific
    * floating-point interpolation a `percentile`-threshold comparison
    * would ride on. One shuffle on source. */
  private def qualityGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byScore = Window.partitionBy($"source")
      .orderBy($"quality".asc, $"doc_id".asc)
    val bySource = Window.partitionBy($"source")
    Tables.documents(s, d)
      .select($"doc_id", $"source", normalizeText($"text").as("norm"))
      // coalesce the empty-document NULL to 0 (worst): Spark sorts
      // NULLS FIRST on ASC, DuckDB NULLS LAST — a NULL would de-sync
      // the two engines' ranks
      .select($"doc_id", $"source",
        coalesce(roundHalfUp(lit(1.0) *
          length(regexp_replace($"norm", "[^a-z]", "")) /
          nullif(length($"norm"), lit(0)), 6), lit(0.0)).as("quality"))
      .withColumn("rn", row_number().over(byScore).cast("long"))
      .withColumn("n", count(lit(1)).over(bySource))
      .filter(expr("rn > n div 4"))
      .select($"doc_id", $"source", $"quality")
      .orderBy($"doc_id")
  }

  // Quality-classifier inference: fixed logistic weights (the trained
  // fastText/regression stand-in — in production these arrive from a
  // model store; the plumbing is identical), keep threshold at
  // σ(z) ≥ 0.5 ⇔ z ≥ 0, and a 10-bin calibration bucket.
  private val QcBias = -5.0
  private val QcWAlpha = 4.0
  private val QcWStop = 5.0
  private val QcWLen = 0.5
  private val QcWDigit = -8.0

  /** Quality-classifier INFERENCE — the learned-gate primitive every
    * other gate in this file hand-codes: score = σ(w·f) per document
    * under a broadcast weight vector, over the same features the
    * rule-based ops expose (`text_quality`'s alpha/digit/stopword
    * ratios plus a log-length term). Emits the calibrated score, the
    * keep decision (σ ≥ 0.5), and the score's calibration bucket
    * (decile) so the downstream calibration histogram is one groupBy
    * away.
    *
    * Scale: features are row-local regex/array counts; the weight
    * vector rides a 1-row broadcast (crossJoin(broadcast) — the
    * model-distribution shape, no shuffle); scoring is codegen'd
    * double arithmetic. A 100 TB corpus pays exactly one scan.
    * Determinism: features round to 6 dp BEFORE the dot product (both
    * engines), the linear term folds in pinned literal order, and the
    * sigmoid output rounds to 6 dp; `keep`/bucket derive from the
    * UNROUNDED z / rounded score respectively, mirrored in SQL. */
  private def qualityClassifier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    classifierScoredOf(Tables.documents(s, d))
      .select($"doc_id", $"f_alpha", $"f_stop", $"f_len", $"f_digit",
        $"score", $"keep", $"cal_bucket")
      .orderBy($"doc_id")
  }

  /** The classifier's row-local scoring over any documents-shaped
    * frame — STATELESS (the weight vector is a broadcast 1-row
    * frame), so it runs unchanged on a STREAMING document source
    * (the `stream_quality_gate` transform) and carries `source`
    * through for per-source folds. */
  private[graft] def classifierScoredOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val n = length($"norm")
    def ratio(c: org.apache.spark.sql.Column) = coalesce(
      roundHalfUp(lit(1.0) * c / nullif(n, lit(0)), 6), lit(0.0))
    val stopList = TextAnalysis.En.map(w => s"t = '$w'").mkString(" OR ")
    val weights = s.range(1).select(
      lit(QcBias).as("b"), lit(QcWAlpha).as("wa"), lit(QcWStop).as("ws"),
      lit(QcWLen).as("wl"), lit(QcWDigit).as("wd"))
    docs
      .select($"doc_id", $"source", normalizeText($"text").as("norm"),
        tokens($"text").as("w"))
      .select($"doc_id", $"source",
        ratio(length(regexp_replace($"norm", "[^a-z]", ""))).as("f_alpha"),
        ratio(length(regexp_replace($"norm", "[^0-9]", ""))).as("f_digit"),
        coalesce(roundHalfUp(lit(1.0) *
          size(expr(s"filter(w, t -> $stopList)")) /
          nullif(size($"w"), lit(0)), 6), lit(0.0)).as("f_stop"),
        roundHalfUp(log(lit(1.0) + size($"w")), 6).as("f_len"))
      .crossJoin(broadcast(weights))
      .withColumn("z", $"b" + $"wa" * $"f_alpha" + $"ws" * $"f_stop" +
        $"wl" * $"f_len" + $"wd" * $"f_digit")
      .select($"doc_id", $"source", $"f_alpha", $"f_stop", $"f_len",
        $"f_digit",
        roundHalfUp(lit(1.0) / (lit(1.0) + exp(-$"z")), 6).as("score"),
        ($"z" >= 0.0).as("keep"),
        least(floor(roundHalfUp(lit(1.0) / (lit(1.0) + exp(-$"z")), 6)
          * 10).cast("int"), lit(9)).as("cal_bucket"))
  }

  /** The classifier's per-doc raw logit + 6-dp sigmoid score over an
    * arbitrary `(doc_id, text, …)` frame — exposed for composition
    * (e.g. `dedup_canonical_quality` picks cluster survivors by this
    * score). Same arithmetic as [[qualityClassifier]]. */
  private[ops] def qualityScoreOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val n = length($"norm")
    def ratio(c: org.apache.spark.sql.Column) = coalesce(
      roundHalfUp(lit(1.0) * c / nullif(n, lit(0)), 6), lit(0.0))
    val stopList = TextAnalysis.En.map(w => s"t = '$w'").mkString(" OR ")
    docs
      .select($"doc_id", normalizeText($"text").as("norm"),
        tokens($"text").as("w"))
      .select($"doc_id",
        ratio(length(regexp_replace($"norm", "[^a-z]", ""))).as("f_alpha"),
        ratio(length(regexp_replace($"norm", "[^0-9]", ""))).as("f_digit"),
        coalesce(roundHalfUp(lit(1.0) *
          size(expr(s"filter(w, t -> $stopList)")) /
          nullif(size($"w"), lit(0)), 6), lit(0.0)).as("f_stop"),
        roundHalfUp(log(lit(1.0) + size($"w")), 6).as("f_len"))
      .select($"doc_id",
        (lit(QcBias) + lit(QcWAlpha) * $"f_alpha" + lit(QcWStop) * $"f_stop" +
          lit(QcWLen) * $"f_len" + lit(QcWDigit) * $"f_digit").as("z"))
      .select($"doc_id",
        roundHalfUp(lit(1.0) / (lit(1.0) + exp(-$"z")), 6).as("q_score"),
        ($"z" >= 0.0).as("q_keep"))
  }

  /** DuckDB mirror of [[qualityScoreOf]] as one CTE named `qscore`
    * (doc_id, q_score, q_keep) — keep derives from the UNROUNDED
    * logit, exactly as `quality_classifier`'s `keep` does. */
  private[ops] def qualityScoreSql: String =
    s"""qscore AS (
       |  SELECT doc_id,
       |    ${roundHalfUpSql("1.0 / (1.0 + exp(-z))", 6)} AS q_score,
       |    z >= 0.0 AS q_keep
       |  FROM (
       |  SELECT doc_id,
       |    $QcBias + $QcWAlpha * f_alpha + $QcWStop * f_stop +
       |      $QcWLen * f_len + $QcWDigit * f_digit AS z
       |  FROM (
       |    SELECT doc_id,
       |      COALESCE(${roundHalfUpSql(
          "1.0 * len(regexp_replace(norm, '[^a-z]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_alpha,
       |      COALESCE(${roundHalfUpSql(
          "1.0 * len(regexp_replace(norm, '[^0-9]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_digit,
       |      COALESCE(${roundHalfUpSql(
          s"1.0 * len(list_filter(w, t -> ${
            TextAnalysis.inListSql("t", TextAnalysis.En)})) " +
            "/ NULLIF(len(w), 0)", 6)}, 0.0) AS f_stop,
       |      ${roundHalfUpSql("ln(1.0 + len(w))", 6)} AS f_len
       |    FROM (
       |      SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |        ${tokensSql("text")} AS w
       |      FROM documents
       |    )
       |  )
       |  )
       |)""".stripMargin

  /** Feature + logit CTEs shared by the classifier oracle and the
    * calibration oracle (ends in `scored(doc_id, f_*, z)`). */
  private def classifierCtes: String =
    s"""feats AS (
       |  SELECT doc_id,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(regexp_replace(norm, '[^a-z]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_alpha,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(regexp_replace(norm, '[^0-9]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_digit,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(list_filter(w, t -> ${
            TextAnalysis.inListSql("t", TextAnalysis.En)})) " +
            "/ NULLIF(len(w), 0)", 6)}, 0.0) AS f_stop,
       |    ${roundHalfUpSql("ln(1.0 + len(w))", 6)} AS f_len
       |  FROM (
       |    SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |      ${tokensSql("text")} AS w
       |    FROM documents
       |  )
       |),
       |scored AS (
       |  SELECT doc_id, f_alpha, f_stop, f_len, f_digit,
       |    $QcBias + $QcWAlpha * f_alpha + $QcWStop * f_stop +
       |      $QcWLen * f_len + $QcWDigit * f_digit AS z
       |  FROM feats
       |)""".stripMargin

  /** Reliability histogram of the learned gate against the rule-based
    * gate — the check a pipeline runs BEFORE swapping the heuristic
    * for the classifier: per calibration decile, how many documents
    * the classifier keeps and how many the `quality_gate` rule
    * actually passes. Monotone gate-pass rate across deciles means
    * the score ORDERS documents the way the shipped rule does (the
    * judgment the swap rests on); a flat or inverted decile says the
    * classifier disagrees where it is most confident. One scan for
    * features + the gate's per-source window + a ≤ 10-row fold. */
  private def qualityCalibration(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cls = qualityClassifier(s, d).select($"doc_id", $"cal_bucket", $"keep")
    val gate = qualityGate(s, d).select($"doc_id").withColumn("g", lit(1L))
    cls.join(gate, Seq("doc_id"), "left")
      .groupBy($"cal_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_keep"),
        sum(coalesce($"g", lit(0L))).as("n_gate_pass"))
      .withColumn("gate_pass_rate",
        roundHalfUp(lit(1.0) * $"n_gate_pass" / $"n_docs", 6))
      .orderBy($"cal_bucket")
  }

  private def qualityCalibrationOracle: String = {
    val sig = "1.0 / (1.0 + exp(-z))"
    s"""WITH $classifierCtes,
       |cls AS (
       |  SELECT doc_id, z >= 0.0 AS keep,
       |    CAST(LEAST(FLOOR(${roundHalfUpSql(sig, 6)} * 10), 9) AS INT)
       |      AS cal_bucket
       |  FROM scored
       |),
       |gscored AS (
       |  SELECT doc_id, source,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(regexp_replace(${normalizeTextSql("text")}, '[^a-z]', '', 'g')) " +
            s"/ nullif(len(${normalizeTextSql("text")}), 0)", 6)}, 0.0) AS quality
       |  FROM documents
       |),
       |granked AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY quality ASC, doc_id ASC) AS rn,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM gscored
       |),
       |gpass AS (SELECT doc_id FROM granked WHERE rn > n // 4)
       |SELECT c.cal_bucket, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN c.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_gate_pass,
       |  ${roundHalfUpSql(
        "1.0 * SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) " +
          "/ COUNT(*)", 6)} AS gate_pass_rate
       |FROM cls c LEFT JOIN gpass g ON c.doc_id = g.doc_id
       |GROUP BY c.cal_bucket
       |ORDER BY cal_bucket""".stripMargin
  }

  private[graft] def qualityClassifierOracle: String = {
    val sig = "1.0 / (1.0 + exp(-z))"
    s"""WITH feats AS (
       |  SELECT doc_id,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(regexp_replace(norm, '[^a-z]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_alpha,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(regexp_replace(norm, '[^0-9]', '', 'g')) " +
            "/ NULLIF(len(norm), 0)", 6)}, 0.0) AS f_digit,
       |    COALESCE(${roundHalfUpSql(
          s"1.0 * len(list_filter(w, t -> ${
            TextAnalysis.inListSql("t", TextAnalysis.En)})) " +
            "/ NULLIF(len(w), 0)", 6)}, 0.0) AS f_stop,
       |    ${roundHalfUpSql("ln(1.0 + len(w))", 6)} AS f_len
       |  FROM (
       |    SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |      ${tokensSql("text")} AS w
       |    FROM documents
       |  )
       |),
       |scored AS (
       |  SELECT doc_id, f_alpha, f_stop, f_len, f_digit,
       |    $QcBias + $QcWAlpha * f_alpha + $QcWStop * f_stop +
       |      $QcWLen * f_len + $QcWDigit * f_digit AS z
       |  FROM feats
       |)
       |SELECT doc_id, f_alpha, f_stop, f_len, f_digit,
       |  ${roundHalfUpSql(sig, 6)} AS score,
       |  z >= 0.0 AS keep,
       |  CAST(LEAST(FLOOR(${roundHalfUpSql(sig, 6)} * 10), 9) AS INT)
       |    AS cal_bucket
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  // Per-domain document cap (the CommonCrawl-style guard against one
  // domain flooding the corpus).
  private val DomainCap = 100

  /** Per-domain cap: keep at most [[DomainCap]] documents per source,
    * chosen by a keyed priority hash (so the kept subset is stable
    * across reruns and ingest order, unlike a LIMIT). Output carries
    * the priority rank for downstream tightening of the cap without
    * recomputation. */
  private def domainCap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pri = hash60(concat(lit("cap:"), $"doc_id".cast("string")))
    val w = Window.partitionBy($"source").orderBy(pri.asc, $"doc_id".asc)
    Tables.documents(s, d)
      .select($"doc_id", $"source")
      .withColumn("cap_rank", row_number().over(w).cast("long"))
      .filter($"cap_rank" <= DomainCap)
      .orderBy($"doc_id")
  }

  // Salt fan-out for the two-stage cap (the skew guard).
  private val CapSalts = 8

  /** Two-stage SALTED domain cap — the mega-source skew guard the
    * plain [[domainCap]] only documents: stage 1 caps each
    * (source, salt) shard at [[DomainCap]] by the SAME priority hash
    * (WindowGroupLimit keeps ≤ K rows per shard per partition before
    * any shuffle), stage 2 re-ranks the ≤ K·[[CapSalts]] survivors per
    * source and cuts at K. Output is provably IDENTICAL to the
    * single-stage cap — the global top-K by priority is a subset of
    * the union of per-salt top-Ks — so the oracle is the SAME SQL as
    * `domain_cap`, and the win is purely structural: no single task
    * ever sorts a whole source, so a source with 10⁹ documents costs
    * each task at most its salt shard. `LmCurationSpec` pins equality
    * row-for-row. */
  private def domainCapSalted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pri = hash60(concat(lit("cap:"), $"doc_id".cast("string")))
    val salted = Window.partitionBy($"source", $"salt").orderBy(pri.asc, $"doc_id".asc)
    val merged = Window.partitionBy($"source").orderBy(pri.asc, $"doc_id".asc)
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        pmod(hash60(concat(lit("capsalt:"), $"doc_id".cast("string"))),
          lit(CapSalts)).as("salt"))
      .withColumn("srn", row_number().over(salted))
      .filter($"srn" <= DomainCap)
      .withColumn("cap_rank", row_number().over(merged).cast("long"))
      .filter($"cap_rank" <= DomainCap)
      .select($"doc_id", $"source", $"cap_rank")
      .orderBy($"doc_id")
  }

  // Epoch-shuffle fan-out: number of independent output shards. 32
  // here to match the test parallelism; at 100 TB this is the writer
  // parallelism knob (thousands), not a semantic choice.
  private val ShuffleShards = 32

  /** Deterministic global shuffle: assign every document a (shard,
    * position) in a pseudo-random but fully reproducible training
    * order keyed on doc_id. The order is identical on any cluster and
    * any rerun; the next epoch changes the seed string. */
  private def corpusShuffle(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val h = hash60(concat(lit("shuf:e0:"), $"doc_id".cast("string")))
    val w = Window.partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
    Tables.documents(s, d)
      .select($"doc_id", h.as("h"))
      .withColumn("shard", ($"h" % ShuffleShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }

  // Hashed-n-gram importance resampling (the DSIR shape, Xie et al.
  // 2023): feature-hash bucket count and the target-domain stand-in.
  // B buckets make BOTH unigram models fixed-size broadcast tables no
  // matter the corpus size — that is the whole trick.
  private val DsirBuckets = 512
  private val DsirTarget = "src0"

  /** Importance-weighted data selection: score every document by how
    * much more likely its hashed-token features are under the TARGET
    * distribution (documents from [[DsirTarget]], the curated-domain
    * stand-in) than under the RAW corpus distribution — the
    * hashed-n-gram importance-resampling recipe. log-ratio weights per
    * bucket, add-one smoothed; a positive length-normalized weight
    * means "more target-like than corpus-average", the resample keeps
    * those. Scale shape: one bucket-keyed count shuffle trains both
    * models in the SAME pass (map-side combined; ≤ [[DsirBuckets]]
    * rows out), the per-bucket log-ratio table broadcasts, and scoring
    * is scan + broadcast-join + doc-keyed partial agg. Log-ratios are
    * quantized to 9 decimals and summed in DECIMAL, so combine order
    * cannot flip a document's keep decision. */
  private def dsirSelect(s: SparkSession, d: String): DataFrame =
    dsirScore(s, Tables.documents(s, d))

  /** [[dsirSelect]] over an arbitrary (doc_id, source, text) frame
    * (spec hook). */
  private[graft] def dsirScore(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val inst = docs
      .select($"doc_id", $"source", explode(tokens($"text")).as("term"))
      .select($"doc_id", $"source",
        (hash60(concat(lit("dsir:"), $"term")) % DsirBuckets).as("b"))
    val model = inst.groupBy($"b")
      .agg(count(lit(1)).as("cr"),
        countWhen($"source" === DsirTarget).as("ct"))
    val tot = model.agg(sum($"cr").cast("double").as("nr"),
      sum($"ct").cast("double").as("nt"))
    val lw = model.crossJoin(broadcast(tot))
      .select($"b", roundHalfUp(
        log(($"ct" + 1).cast("double") / ($"nt" + lit(DsirBuckets))) -
          log(($"cr" + 1).cast("double") / ($"nr" + lit(DsirBuckets))), 9)
        .as("lw"))
    inst.join(broadcast(lw), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum($"lw".cast("decimal(27,18)")).as("slw"))
      .select($"doc_id", $"n_feats",
        roundHalfUp($"slw".cast("double") / $"n_feats", 6).as("lw_avg"))
      .withColumn("keep", $"lw_avg" > 0)
      .orderBy($"doc_id")
  }

  private def dsirOracle: String =
    s"""WITH inst AS (
       |  SELECT doc_id, source, ${hash60Sql("'dsir:' || term")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, source, unnest(${tokensSql("text")}) AS term
       |        FROM documents)
       |),
       |model AS (
       |  SELECT b, COUNT(*) AS cr,
       |    CAST(SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ct
       |  FROM inst GROUP BY b
       |),
       |tot AS (
       |  SELECT CAST(SUM(cr) AS DOUBLE) AS nr, CAST(SUM(ct) AS DOUBLE) AS nt
       |  FROM model
       |),
       |lw AS (
       |  SELECT b, ${roundHalfUpSql(
            s"ln((ct + 1.0) / (t.nt + $DsirBuckets)) - " +
              s"ln((cr + 1.0) / (t.nr + $DsirBuckets))", 9)} AS lw
       |  FROM model CROSS JOIN tot t
       |),
       |scored AS (
       |  SELECT i.doc_id, COUNT(*) AS n_feats,
       |    ${roundHalfUpSql(
            "CAST(SUM(CAST(l.lw AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)",
            6)} AS lw_avg
       |  FROM inst i JOIN lw l ON i.b = l.b
       |  GROUP BY i.doc_id
       |)
       |SELECT doc_id, n_feats, lw_avg, lw_avg > 0 AS keep
       |FROM scored
       |ORDER BY doc_id""".stripMargin

  // Target language mixture for [[corpusMixReport]] (permille of the
  // training-token budget per language; must sum to 1000).
  private val LangTargetPermille: Seq[(String, Int)] = Seq(
    "en" -> 500, "es" -> 150, "de" -> 150, "zh" -> 100, "fr" -> 100)

  /** The mixture MATH behind `sample_weighted`'s schedule: per
    * language, observed token mass vs the target mixture → the
    * down-sampling rate (capped at 1) and the unclamped epoch factor
    * (> 1 = the language must repeat to hit its target — the signal
    * to go collect more of it). Shares divide by a 1-row broadcast
    * total and the target table is a literal broadcast, so the whole
    * report is one token-count scan + one tiny aggregate at any
    * corpus size. Rates are derived from RAW shares and quantized
    * only on output, identically in both engines. */
  // Token-budget knobs: budget = 30 % of corpus tokens (integer-exact
  // `total*3 div 10`); quality buckets = lexical diversity quantized
  // to 3 dp (≤ 1001 buckets).
  private val BudgetPctNum = 3
  private val BudgetPctDen = 10

  /** Budgeted corpus selection — "fill a token budget with the best
    * documents": rank docs by a quality score (lexical diversity =
    * distinct words / words, row-local) and keep the top of the
    * ranking until 30 % of the corpus's tokens are spent. The
    * scale-honest form: NO global quality sort — scores quantize to
    * ≤ 1001 integer buckets, the greedy prefix resolves on the BUCKET
    * histogram (cumulative token sums over ≤ 1001 rows), whole buckets
    * above the threshold enter outright, and only the single boundary
    * bucket's docs see an ordered window (doc_id order, partial-budget
    * running sum) — the winsorize/RFM boundary pattern applied to
    * selection. Boundary-bucket width bounds that window's partition.
    *
    * Determinism: scores are integer millis (`floor(1000·d/n + 0.5)`),
    * budgets and running sums exact integers, boundary ties break by
    * doc_id — identical in both engines under any partitioning. */
  private def corpusTokenBudget(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", size($"w").cast("long").as("n_tokens"),
        expr("CAST(FLOOR(1000.0 * size(array_distinct(w)) / size(w) + 0.5) AS INT)")
          .as("qb"))
      // four consumers (budget, histogram, both selection joins): cache
      // the 3-number-per-doc frame so tokenization runs once
      .cache()
    val budget = docs.agg(
      expr(s"(sum(n_tokens) * $BudgetPctNum) div $BudgetPctDen").as("budget"))
    val wdesc = Window.orderBy($"qb".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ 1001 histogram rows: the global window is over BUCKETS, never docs
    val hist = docs.groupBy($"qb").agg(sum($"n_tokens").as("tok_b"))
      .withColumn("cum", sum($"tok_b").over(wdesc))
      .crossJoin(broadcast(budget))
      .withColumn("budget_left", $"budget" - ($"cum" - $"tok_b"))
    val fullIn = docs.join(
      broadcast(hist.filter($"cum" <= $"budget").select($"qb")), "qb")
      .select($"doc_id", $"n_tokens", $"qb")
    val boundary = hist
      .filter($"cum" > $"budget" && $"budget_left" > 0)
      .select($"qb", $"budget_left")
    val wb = Window.partitionBy($"qb").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val partialIn = docs.join(broadcast(boundary), "qb")
      .withColumn("run", sum($"n_tokens").over(wb))
      .filter($"run" <= $"budget_left")
      .select($"doc_id", $"n_tokens", $"qb")
    fullIn.unionByName(partialIn)
      .orderBy($"doc_id")
  }

  private def tokenBudgetOracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(FLOOR(1000.0 * len(list_distinct(w)) / len(w) + 0.5) AS INT)
       |      AS qb
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents)
       |  WHERE len(w) > 0
       |),
       |b AS (
       |  SELECT (SUM(n_tokens) * $BudgetPctNum) // $BudgetPctDen AS budget
       |  FROM docs
       |),
       |hist AS (
       |  SELECT qb, SUM(n_tokens) AS tok_b FROM docs GROUP BY qb
       |),
       |cumh AS (
       |  SELECT qb, tok_b,
       |    SUM(tok_b) OVER (ORDER BY qb DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist
       |),
       |marked AS (
       |  SELECT c.qb, c.cum, c.cum - c.tok_b AS cum_before,
       |    b.budget - (c.cum - c.tok_b) AS budget_left, b.budget
       |  FROM cumh c CROSS JOIN b
       |),
       |full_in AS (
       |  SELECT d.doc_id, d.n_tokens, d.qb
       |  FROM docs d JOIN marked m ON m.qb = d.qb AND m.cum <= m.budget
       |),
       |partial_in AS (
       |  SELECT doc_id, n_tokens, qb FROM (
       |    SELECT d.doc_id, d.n_tokens, d.qb, m.budget_left,
       |      SUM(d.n_tokens) OVER (PARTITION BY d.qb ORDER BY d.doc_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |    FROM docs d
       |    JOIN marked m ON m.qb = d.qb
       |      AND m.cum > m.budget AND m.budget_left > 0
       |  ) WHERE run <= budget_left
       |)
       |SELECT doc_id, n_tokens, qb FROM full_in
       |UNION ALL
       |SELECT doc_id, n_tokens, qb FROM partial_in
       |ORDER BY doc_id""".stripMargin

  /** Temperature-scaled multilingual sampling weights (Conneau &
    * Lample 2019, arXiv:1901.07291 §3.1; Arivazhagan et al. 2019,
    * arXiv:1907.05019 §4): q_i ∝ p_i^α with α = 1/T rebalances a
    * skewed language mix toward low-resource languages without the
    * hard targets [[corpusMixReport]] uses. α = 0.5 here, so the
    * weight is √p — computed with IEEE `sqrt` (correctly rounded in
    * any engine, unlike `pow`) and QUANTIZED to a 6-dp decimal before
    * normalization, so the denominator is an exact decimal sum
    * (order-independent — the [[graft.functions.Exact]] discipline)
    * and the released shares are bit-reproducible at any parallelism.
    * `epochs` = q_i/p_i is the implied per-language oversampling
    * factor a loader would apply.
    *
    * Scale: one keyed fold over the corpus to per-language token
    * counts; everything after is language-cardinality-bounded. */
  private def corpusMixTemperature(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val perLang = Tables.documents(s, d)
      .select($"lang", size(tokens($"text")).as("n_tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").cast("long").as("n_tokens"))
    val total = perLang.agg(sum($"n_tokens").cast("long").as("tot_tokens"))
    val p = $"n_tokens".cast("double") / $"tot_tokens".cast("double")
    // the whole frame is one row per language — a single-partition
    // window over it is a handful of rows, not a scale hazard
    val win = Window.partitionBy(lit(1))
    val qRaw = $"w".cast("double") / $"denom".cast("double")
    perLang.crossJoin(broadcast(total))
      .withColumn("p", p)
      .withColumn("w",
        sqrt($"p").cast(org.apache.spark.sql.types.DecimalType(27, 6)))
      .withColumn("denom", sum($"w").over(win))
      .select($"lang", $"n_docs", $"n_tokens",
        roundHalfUp($"p", 6).as("token_share"),
        $"w".cast("double").as("temp_weight"),
        roundHalfUp(qRaw, 6).as("sample_share"),
        roundHalfUp(qRaw / $"p", 6).as("epochs"))
      .orderBy($"lang")
  }

  private def corpusMixReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perLang = Tables.documents(s, d)
      .select($"lang", size(tokens($"text")).as("n_tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").cast("long").as("n_tokens"))
    val total = perLang.agg(sum($"n_tokens").cast("long").as("tot_tokens"))
    val target = LangTargetPermille.toDF("lang", "target_pm")
    val share = lit(1.0) * $"n_tokens" / $"tot_tokens"
    val ratio = (coalesce($"target_pm", lit(0)) / lit(1000.0)) / share
    perLang.crossJoin(broadcast(total))
      .join(broadcast(target), Seq("lang"), "left")
      .select($"lang", $"n_docs", $"n_tokens",
        roundHalfUp(share, 6).as("token_share"),
        coalesce($"target_pm", lit(0)).cast("long").as("target_permille"),
        roundHalfUp(least(lit(1.0), ratio), 6).as("sample_rate"),
        roundHalfUp(ratio, 6).as("epochs"))
      .orderBy($"lang")
  }

  private val EnsBuckets = 1000

  /** Bucket-CDF of a (doc_id, v) signal: percentile = share of docs
    * in value-buckets ≤ mine, at 1/[[EnsBuckets]] granularity. The
    * scale-correct rank: a true percent_rank global-sorts N rows; this
    * is one stats row, one map-side-combined histogram, and a
    * cumulative window over ≤ 1000 BUCKET rows (whitelisted in
    * PlanSpec) — ties inside a bucket share a percentile, the stated
    * approximation. */
  private def bucketCdf(sig: DataFrame, out: String): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val st = sig.agg(min($"v").as("lo"), max($"v").as("hi"),
      count(lit(1)).as("n"))
    val b = sig.crossJoin(broadcast(st))
      .select($"doc_id",
        when($"hi" === $"lo", lit(0)).otherwise(
          least(lit(EnsBuckets - 1),
            floor(($"v" - $"lo") * EnsBuckets / ($"hi" - $"lo"))
              .cast("int"))).as("b"))
    val wc = Window.orderBy($"b".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.groupBy($"b").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(wc))
    b.join(cum.select($"b", $"cum"), "b")
      .crossJoin(broadcast(st.select($"n")))
      .select($"doc_id", roundHalfUp(lit(1.0) * $"cum" / $"n", 6).as(out))
  }

  /** Quality-signal ENSEMBLE — the CCNet-shape fusion (Wenzek et al.,
    * arXiv:1911.00359) of the catalog's two independent quality
    * scorers: the learned classifier (`quality_classifier`'s sigmoid,
    * the fastText-style gate) and the unigram LM's cross-entropy
    * (`text_lm_score`, the KenLM-perplexity stand-in; negated so
    * higher = better). Raw scores live on incomparable scales, so
    * each converts to a corpus PERCENTILE via [[bucketCdf]] — rank
    * fusion, robust to any monotone rescaling of either model — and
    * the ensemble is their mean, gated at the median. One filter
    * passing garbage (boilerplate scores high on alpha ratio; rare-
    * word spam fools a unigram LM less than a ratio gate) gets
    * vetoed by the other — the reason production pipelines fuse
    * rather than pick one.
    *
    * Scale: both signal passes are the underlying ops' own (scan +
    * vocab-broadcast joins); ranking adds NO global sort — two
    * ≤ 1000-row bucket windows and doc-keyed joins. */
  private def qualityEnsemble(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clf = qualityClassifier(s, d).select($"doc_id", $"score".as("v"))
    val lm = TextAnalysis.lmScore(s, Tables.documents(s, d))
      .select($"doc_id", (-$"cross_entropy").as("v"))
    bucketCdf(clf, "p_clf").join(bucketCdf(lm, "p_lm"), "doc_id")
      .select($"doc_id", $"p_clf", $"p_lm",
        roundHalfUp(($"p_clf" + $"p_lm") / 2.0, 6).as("ensemble"))
      .withColumn("keep", $"ensemble" >= 0.5)
      .orderBy($"doc_id")
  }

  /** One signal's oracle CDF chain under a CTE prefix. */
  private def cdfSql(p: String, sig: String): String =
    s"""${p}st AS (
       |  SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM $sig
       |),
       |${p}b AS (
       |  SELECT doc_id,
       |    CASE WHEN hi = lo THEN 0
       |         ELSE LEAST(${EnsBuckets - 1},
       |           CAST(FLOOR((v - lo) * $EnsBuckets / (hi - lo)) AS INT))
       |    END AS b
       |  FROM $sig CROSS JOIN ${p}st
       |),
       |${p}h AS (SELECT b, COUNT(*) AS c FROM ${p}b GROUP BY b),
       |${p}c AS (
       |  SELECT b, SUM(c) OVER (ORDER BY b ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM ${p}h
       |),
       |${p}p AS (
       |  SELECT x.doc_id, ${roundHalfUpSql("1.0 * c.cum / s.n", 6)} AS p
       |  FROM ${p}b x JOIN ${p}c c ON c.b = x.b CROSS JOIN ${p}st s
       |)""".stripMargin

  private def qualityEnsembleOracle: String =
    s"""WITH clf0 AS ($qualityClassifierOracle),
       |lm0 AS (${TextAnalysis.lmScoreOracle}),
       |csig AS (SELECT doc_id, score AS v FROM clf0),
       |lsig AS (SELECT doc_id, -cross_entropy AS v FROM lm0),
       |${cdfSql("c", "csig")},
       |${cdfSql("l", "lsig")}
       |SELECT c.doc_id, c.p AS p_clf, l.p AS p_lm,
       |  ${roundHalfUpSql("(c.p + l.p) / 2.0", 6)} AS ensemble,
       |  ${roundHalfUpSql("(c.p + l.p) / 2.0", 6)} >= 0.5 AS keep
       |FROM cp c JOIN lp l ON l.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  /** Minimum group size below which a quasi-identifier combination is
    * re-identifiable (the classic k-anonymity release bar). */
  private val KAnonMin = 5L

  /** k-anonymity + l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007) — the privacy gate a pipeline runs BEFORE releasing a
    * user-derived table into a training corpus: group the release
    * candidate by its quasi-identifier combination (here nation ×
    * market segment × 1000-unit balance band — the attacker-joinable
    * attributes) and measure, per group, k = member count
    * (re-identification risk when k < [[KAnonMin]]) and l = distinct
    * sensitive values (attribute disclosure even at large k when
    * l < 2: the group leaks every member's balance). `at_risk` rows
    * are what a downstream generalize-or-suppress step consumes —
    * this op is the audit artifact, the remediation ladder is a
    * policy decision it feeds.
    *
    * Scale: the (qi, sensitive)→(qi) two-level fold keeps both
    * stages map-side combined (no distinct-agg Expand); output is
    * bounded by the QI domain, never the row count. Negative
    * balances band with FLOOR (both engines floor toward −∞). */
  private def privacyKanonymity(s: SparkSession, d: String): DataFrame =
    kanonymityOf(Tables.customer(s, d))

  /** [[privacyKanonymity]] over an arbitrary customer-shaped frame
    * (spec hook for planted-group fixtures). */
  private[graft] def kanonymityOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val qi = cust
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("bal_band"),
        $"c_acctbal")
    qi.groupBy($"c_nationkey", $"c_mktsegment", $"bal_band", $"c_acctbal")
      .agg(count(lit(1)).as("c"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      .agg(sum($"c").cast("long").as("k"),
        count(lit(1)).as("l_distinct"))
      .select($"c_nationkey", $"c_mktsegment", $"bal_band", $"k",
        $"l_distinct",
        ($"k" < KAnonMin || $"l_distinct" < 2L).as("at_risk"))
      .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
  }

  /** Full-domain generalization to k-anonymity (Samarati 2001 —
    * the remediation `privacy_kanonymity` only audits): walk a fixed
    * generalization LADDER over the quasi-identifier — widen the
    * balance band 1000 → 4000, then suppress the segment, then
    * coarsen nation to a 5-nation region, then total suppression —
    * and release at the MINIMAL level where EVERY group reaches
    * k ≥ [[KAnonMin]] (one level for the whole release, the
    * full-domain model; per-cell generalization would leak which
    * cells were small). Output: the released groups at the chosen
    * level, QI columns rendered as strings with '*' for
    * generalized-away parts, plus the level itself.
    *
    * Engine: each level's min-group-size is one map-side-combined
    * fold to a DRIVER SCALAR (the honest-control-flow pattern); the
    * ladder stops at the first satisfying level, and the oracle
    * evaluates every level's min-k and picks the same minimum in SQL
    * — the hash gate proves the early exit picks the identical level.
    *
    * Scale: one grouped fold per probed level over the release table
    * (ladder depth is a small constant); the released artifact is
    * QI-domain-bounded. */
  private val GenLevels = 5

  private def privacyGeneralize(s: SparkSession, d: String): DataFrame =
    generalizeOf(Tables.customer(s, d))

  /** One ladder rung's QI rendering: (nation, segment, band) columns
    * at generalization `level` — shared by the group folds and the DP
    * sum's clipped-value projection. */
  private def genQi(cust: DataFrame, level: Int)
      : (Column, Column, Column) = {
    val s = cust.sparkSession
    import s.implicits._
    val nat = level match {
      case 0 | 1 | 2 => $"c_nationkey".cast("string")
      case 3 => concat(lit("R"), expr("c_nationkey div 5").cast("string"))
      case _ => lit("*")
    }
    val seg = if (level <= 1) $"c_mktsegment" else lit("*")
    val band = level match {
      case 0 => concat(lit("B"),
        floor($"c_acctbal" / 1000).cast("long").cast("string"))
      case 1 | 2 | 3 => concat(lit("B"),
        floor($"c_acctbal" / 4000).cast("long").cast("string"))
      case _ => lit("*")
    }
    (nat, seg, band)
  }

  /** One ladder rung's QI groups + sizes (spec hook for the
    * minimality check). */
  private[graft] def generalizeLevelGroups(cust: DataFrame,
                                           level: Int): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val (nat, seg, band) = genQi(cust, level)
    cust.select(nat.as("qi_nation"), seg.as("qi_segment"),
        band.as("qi_band"))
      .groupBy($"qi_nation", $"qi_segment", $"qi_band")
      .agg(count(lit(1)).as("k"))
  }

  /** The ladder's chosen level: the first (finest) rung whose min
    * group size satisfies [[KAnonMin]] — one map-side-combined fold
    * to a driver scalar per probed rung. */
  private[graft] def minGenLevel(cust: DataFrame): Int = {
    val s = cust.sparkSession
    import s.implicits._
    var level = 0
    var done = false
    while (!done && level < GenLevels - 1) {
      val r = generalizeLevelGroups(cust, level).agg(min($"k")).head
      // empty release: vacuously k-anonymous at the finest level
      if (r.isNullAt(0) || r.getLong(0) >= KAnonMin) done = true
      else level += 1
    }
    level
  }

  /** [[privacyGeneralize]] over an arbitrary customer-shaped frame. */
  private[graft] def generalizeOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val level = minGenLevel(cust)
    generalizeLevelGroups(cust, level)
      .select($"qi_nation", $"qi_segment", $"qi_band", $"k",
        lit(level).as("gen_level"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_band")
  }

  /** The generalization-ladder CTE prefix (per-level group tables
    * `g0..`, the min-k probe, and the chosen level `sel (lv)`) plus a
    * per-level released-arm builder — shared by the generalize and DP
    * release oracles. */
  private def genLadderSql(armBody: Int => String,
      gExtra: String = "", rawCtes: Boolean = false): String = {
    def natSql(l: Int) = l match {
      case 0 | 1 | 2 => "CAST(c_nationkey AS VARCHAR)"
      case 3 => "'R' || CAST(c_nationkey // 5 AS VARCHAR)"
      case _ => "'*'"
    }
    def segSql(l: Int) = if (l <= 1) "c_mktsegment" else "'*'"
    def bandSql(l: Int) = l match {
      case 0 => "'B' || CAST(CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS VARCHAR)"
      case 1 | 2 | 3 =>
        "'B' || CAST(CAST(FLOOR(c_acctbal / 4000) AS BIGINT) AS VARCHAR)"
      case _ => "'*'"
    }
    val lvls = (0 until GenLevels).map { l =>
      s"""g$l AS (
         |  SELECT ${natSql(l)} AS qi_nation, ${segSql(l)} AS qi_segment,
         |    ${bandSql(l)} AS qi_band, COUNT(*) AS k$gExtra
         |  FROM customer GROUP BY 1, 2, 3
         |)""".stripMargin
    }.mkString(",\n") + (if (!rawCtes) "" else "," + {
      // per-level RAW projections (one row per customer, QI rendered
      // at that rung + the clipped value) for arms that need order
      // statistics rather than group counts
      (0 until GenLevels).map { l =>
        s"""
           |r$l AS (
           |  SELECT ${natSql(l)} AS qi_nation, ${segSql(l)} AS qi_segment,
           |    ${bandSql(l)} AS qi_band,
           |    LEAST(GREATEST(c_acctbal, 0.0), 5000.0) AS v
           |  FROM customer
           |)""".stripMargin
      }.mkString(",")
    })
    val mins = (0 until GenLevels - 1)
      .map(l =>
        s"(SELECT COALESCE(MIN(k), 9223372036854775807) FROM g$l) AS m$l")
      .mkString(", ")
    val pick = (0 until GenLevels - 1)
      .map(l => s"WHEN m$l >= $KAnonMin THEN $l")
      .mkString("CASE ", " ", s" ELSE ${GenLevels - 1} END")
    val arms = (0 until GenLevels).map(armBody).mkString("\nUNION ALL\n")
    s"""WITH $lvls,
       |mins AS (SELECT $mins),
       |sel AS (SELECT $pick AS lv FROM mins)
       |$arms
       |ORDER BY qi_nation, qi_segment, qi_band""".stripMargin
  }

  private def generalizeOracle: String = genLadderSql { l =>
    s"""SELECT qi_nation, qi_segment, qi_band, k,
       |  CAST($l AS INT) AS gen_level
       |FROM g$l WHERE (SELECT lv FROM sel) = $l""".stripMargin
  }

  private val DpEpsilon = 1.0

  /** WARNING stamped on every DP release row: the perturbation in this
    * catalog derives DETERMINISTICALLY from the released keys (so the
    * DuckDB oracle reproduces it bit-for-bit and the hash gate proves
    * the mechanism end-to-end), which means it is publicly
    * recomputable and exactly invertible — ZERO actual privacy. These
    * outputs must never be consumed as genuinely private releases.
    * A production deployment swaps ONLY the uniform draw for a
    * secret-seeded RNG; the clipping, sensitivity accounting,
    * composition, and plan shape are exactly what ships. The marker
    * column makes the surrogate status machine-checkable downstream. */
  private[graft] val NoiseModel = "seeded_surrogate"

  /** ε-differentially-private released counts — the privacy ladder's
    * third rung (audit → generalize → PERTURB): the k-anonymized
    * release at [[generalizeOf]]'s minimal level gets Laplace(Δ/ε)
    * noise on every group count before it leaves the engine, with the
    * (ε, Δ) accounting emitted as columns. Count queries under
    * add/remove-one-person adjacency have sensitivity Δ = 1 (one
    * individual sits in exactly one QI group), so b = 1/ε.
    *
    * The noise is a DETERMINISTIC surrogate: the uniform draw is a
    * seeded hash of the group's QI key mapped into (−1, 1), pushed
    * through the standard Laplace inverse CDF −b·sign(u)·ln(1−|u|) —
    * so the DuckDB oracle derives bit-for-bit the same perturbation
    * and the hash gate proves the mechanism end-to-end. A production
    * release swaps the hash for a secret-seeded RNG; everything else
    * (the k-anon composition, the sensitivity accounting, the plan
    * shape) is exactly this op. True counts do NOT appear in the
    * output.
    *
    * Scale: [[generalizeOf]]'s ladder probes + one row-local noise
    * projection over the QI-domain-bounded release. */
  private def privacyDpCounts(s: SparkSession, d: String): DataFrame =
    dpCountsOf(Tables.customer(s, d))

  /** [[privacyDpCounts]] over an arbitrary customer-shaped frame. */
  private[graft] def dpCountsOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val u = (hash60(concat(lit("dp:"), $"qi_nation", lit("|"),
      $"qi_segment", lit("|"), $"qi_band")) % 2000001L - 1000000L) /
      lit(1000001.0)
    generalizeOf(cust)
      .withColumn("u", u)
      .select($"qi_nation", $"qi_segment", $"qi_band",
        roundHalfUp($"k" - lit(1.0 / DpEpsilon) * signum($"u") *
          log(lit(1.0) - abs($"u")), 6).as("noisy_count"),
        lit(DpEpsilon).as("epsilon"),
        lit(1L).as("sensitivity"),
        $"gen_level",
        lit(NoiseModel).as("noise_model"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_band")
  }

  private def dpCountsOracle: String = genLadderSql { l =>
    val uExpr = s"((${graft.functions.TextFns.hash60Sql(
      "'dp:' || qi_nation || '|' || qi_segment || '|' || qi_band")}" +
      s" % 2000001 - 1000000) / 1000001.0)"
    s"""SELECT qi_nation, qi_segment, qi_band,
       |  ${roundHalfUpSql(
          s"k - (1.0 / $DpEpsilon) * SIGN($uExpr) * ln(1.0 - ABS($uExpr))",
          6)} AS noisy_count,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  CAST(1 AS BIGINT) AS sensitivity,
       |  CAST($l AS INT) AS gen_level,
       |  '$NoiseModel' AS noise_model
       |FROM g$l WHERE (SELECT lv FROM sel) = $l""".stripMargin
  }

  /** Per-record contribution bound for the DP sum release: account
    * balances are clipped into [0, [[DpClip]]] BEFORE aggregation, so
    * one individual's presence changes any group sum by at most
    * [[DpClip]] — the sensitivity the Laplace scale b = Δ/ε uses.
    * The textbook bounded-contribution mechanism (Dwork & Roth 2014,
    * §3.3): without the clip, a single outlier balance makes the true
    * sensitivity unbounded and no finite noise is private. */
  private val DpClip = 5000.0

  /** ε-DP released SUMS — the DP rung's aggregate counterpart to
    * [[privacyDpCounts]]: per released QI group, the sum of CLIPPED
    * account balances plus Laplace([[DpClip]]/ε) noise, composed with
    * the same generalization ladder (the group keys are the
    * k-anonymized release's, so the two mechanisms answer over the
    * identical domain). The clipped values accumulate in DECIMAL
    * (order-independent exact sums — the [[graft.functions.Exact]]
    * discipline; a raw double sum could not hash-match the
    * single-threaded oracle at 1000 executors), and the deterministic
    * seeded-hash noise surrogate is [[privacyDpCounts]]'s, under an
    * independent seed. True sums never appear in the output.
    *
    * Scale: the ladder probes (driver scalars) + one keyed grouped
    * fold over the release with a row-local clip — QI-domain-bounded
    * output, flat in corpus size. */
  private def privacyDpSum(s: SparkSession, d: String): DataFrame =
    dpSumOf(Tables.customer(s, d))

  /** [[privacyDpSum]] over an arbitrary customer-shaped frame. */
  private[graft] def dpSumOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val level = minGenLevel(cust)
    val (nat, seg, band) = genQi(cust, level)
    val clip = least(greatest($"c_acctbal", lit(0.0)), lit(DpClip))
    val u = (hash60(concat(lit("dpsum:"), $"qi_nation", lit("|"),
      $"qi_segment", lit("|"), $"qi_band")) % 2000001L - 1000000L) /
      lit(1000001.0)
    cust.select(nat.as("qi_nation"), seg.as("qi_segment"),
        band.as("qi_band"),
        clip.cast(org.apache.spark.sql.types.DecimalType(27, 6)).as("v"))
      .groupBy($"qi_nation", $"qi_segment", $"qi_band")
      .agg(sum($"v").cast("double").as("s_clip"))
      .withColumn("u", u)
      .select($"qi_nation", $"qi_segment", $"qi_band",
        roundHalfUp($"s_clip" - lit(DpClip / DpEpsilon) * signum($"u") *
          log(lit(1.0) - abs($"u")), 6).as("noisy_sum"),
        lit(DpEpsilon).as("epsilon"),
        lit(DpClip).as("sensitivity"),
        lit(level).as("gen_level"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_band")
  }

  // LOCAL-DP randomized response over the market-segment attribute.
  // The domain is the five public TPC-H segments; p_keep is the k-ary
  // RR truth probability e^ε/(e^ε + k − 1), computed ONCE here and
  // embedded as a numeric literal in BOTH engines (Double.toString
  // round-trips exactly, so no cross-libm exp() ever runs in the
  // oracle).
  private val LdpSegments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")
  private val LdpKeep: Double =
    math.exp(DpEpsilon) / (math.exp(DpEpsilon) + LdpSegments.size - 1)
  private val LdpOther: Double = (1.0 - LdpKeep) / (LdpSegments.size - 1)
  private val LdpDenom: Double = LdpKeep - LdpOther

  /** LOCAL-DP frequency estimation via k-ary randomized response
    * (Warner 1965; the RAPPOR family, Erlingsson et al. 2014,
    * arXiv:1407.6981) — the privacy family's fourth mechanism and its
    * first in the LOCAL model, where the aggregator itself is
    * untrusted: each record randomizes its OWN segment before
    * anything aggregates (truth with probability p = e^ε/(e^ε+k−1),
    * else one of the k−1 other segments uniformly — both draws
    * row-local seeded hashes), and the release is the standard
    * debiased estimate n̂_v = (c_v − n·q)/(p − q). No trusted curator,
    * no clipping, no generalization ladder — the mechanism contrast
    * with the central-model rungs is the point.
    *
    * Scale: the response is row-local (one hash + one array pick per
    * record); the estimate is one k-bounded fold. */
  private def privacyLdpFrequency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = LdpSegments.size
    val segArr = array(LdpSegments.map(lit): _*)
    val u1 = (hash60(concat(lit("ldp1:"), $"c_custkey".cast("string"))) %
      1000000L) / lit(1000000.0)
    val idx = hash60(concat(lit("ldp2:"), $"c_custkey".cast("string"))) %
      (k - 1)
    val reported = Tables.customer(s, d)
      .select(when(u1 < LdpKeep, $"c_mktsegment")
        .otherwise(element_at(
          filter(segArr, x => x =!= $"c_mktsegment"),
          (idx + 1).cast("int"))).as("segment"))
      .groupBy($"segment").agg(count(lit(1)).as("n_reports"))
    val total = reported.agg(sum($"n_reports").cast("long").as("n"))
    LdpSegments.toDF("segment")
      .join(reported, Seq("segment"), "left")
      .crossJoin(broadcast(total))
      .select($"segment",
        coalesce($"n_reports", lit(0L)).as("n_reports"),
        roundHalfUp((coalesce($"n_reports", lit(0L)) - $"n" * LdpOther) /
          lit(LdpDenom), 6).as("est_count"),
        lit(DpEpsilon).as("epsilon"),
        roundHalfUp(lit(LdpKeep), 6).as("p_keep"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"segment")
  }

  private def ldpFrequencyOracle: String = {
    val segsVals = LdpSegments.map(x => s"('$x')").mkString(", ")
    val segsList = LdpSegments.map(x => s"'$x'").mkString("[", ", ", "]")
    val u1 = s"(CAST(${graft.functions.TextFns.hash60Sql(
      "'ldp1:' || CAST(c_custkey AS VARCHAR)")} % 1000000 AS DOUBLE)" +
      " / 1000000.0)"
    val idx = s"(${graft.functions.TextFns.hash60Sql(
      "'ldp2:' || CAST(c_custkey AS VARCHAR)")} % ${LdpSegments.size - 1})"
    s"""WITH rr AS (
       |  SELECT CASE WHEN $u1 < CAST($LdpKeep AS DOUBLE) THEN c_mktsegment
       |    ELSE list_filter($segsList,
       |           x -> x <> c_mktsegment)[CAST($idx + 1 AS INT)]
       |    END AS segment
       |  FROM customer
       |),
       |rep AS (SELECT segment, COUNT(*) AS n_reports FROM rr GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_reports) AS BIGINT) AS n FROM rep),
       |segs(segment) AS (VALUES $segsVals)
       |SELECT s.segment,
       |  CAST(COALESCE(r.n_reports, 0) AS BIGINT) AS n_reports,
       |  ${roundHalfUpSql(
        s"(CAST(COALESCE(r.n_reports, 0) AS DOUBLE) - " +
          s"CAST(t.n AS DOUBLE) * CAST($LdpOther AS DOUBLE)) / " +
          s"CAST($LdpDenom AS DOUBLE)", 6)} AS est_count,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  ${roundHalfUpSql(s"CAST($LdpKeep AS DOUBLE)", 6)} AS p_keep,
       |  '$NoiseModel' AS noise_model
       |FROM segs s LEFT JOIN rep r ON r.segment = s.segment
       |CROSS JOIN tot t
       |ORDER BY s.segment""".stripMargin
  }

  // USER-level DP: the maximum number of released groups one user may
  // contribute to (the L0-sensitivity bound). Without it, a user
  // active in k groups shifts k released counts at once and the
  // per-group ε guarantees compose to k·ε for that user — the gap
  // between event-level and user-level privacy.
  private val DpUserL0Cap = 3

  /** USER-level ε-DP released counts (Dwork & Roth 2014 §3.5
    * composition; the contribution-bounding step every production
    * user-level release runs — e.g. the "bounding user contribution"
    * stage in DP SQL engines, Wilson et al. 2020, VLDB,
    * arXiv:1909.01917): the add/remove-one-USER adjacency makes a
    * count release's L1 sensitivity equal the number of groups that
    * user can touch, so the mechanism (1) DEDUPES to one contribution
    * per (user, group) — bounding L∞ at 1, (2) CAPS each user to at
    * most [[DpUserL0Cap]] groups by a deterministic hash-priority
    * (keep the cap lowest-hash groups; a stable coin flip, not a
    * data-dependent pick that would itself leak), which bounds L0, and
    * (3) releases per-group counts with Laplace(Δ/ε) noise at
    * Δ = L0·L∞ = [[DpUserL0Cap]] — one user now shifts the whole
    * release vector by at most the cap, so a single ε covers the
    * user, not just one group. The central-model rungs
    * ([[privacyDpCounts]]/[[privacyDpSum]]) protect one RECORD per
    * group; this rung protects a PERSON across the release — the
    * distinction that matters when the release domain is keyed by
    * time (here order months: an active customer spans many).
    *
    * Same [[NoiseModel]] surrogate-noise contract as every DP rung.
    *
    * Scale: one (user, group) distinct fold, one per-user window whose
    * partitions are that user's group list (months-active-sized,
    * WindowGroupLimit under the constant cap), one group-keyed count —
    * three keyed shuffles, all on pair/metadata-sized rows. */
  // DP top-k selection: how many identities the release names.
  private val DpTopK = 3

  /** ε-DP top-k selection via the ONE-SHOT GUMBEL mechanism (Durfee &
    * Rogers, NeurIPS 2019, "Practical Differentially Private Top-k
    * Selection" — adding Gumbel noise to every utility and taking the
    * top k is distributionally identical to k rounds of PEELING
    * exponential mechanism at ε/k each): release WHICH k sources
    * dominate the corpus by document count, the selection primitive
    * the ladder's argmax rung ([[privacyDpMedian]] — one winner per
    * group) doesn't cover — k winners from ONE domain, with the
    * composition split across selection and count release. Budget:
    * ε/2 buys the k identities (per-item score ε_sel/(2k)·count + G,
    * Δ = 1 under add/remove-one-document adjacency); the other ε/2
    * buys the k released counts (Laplace(k/ε_cnt) each, ε_cnt/k per
    * count by basic composition). True counts and every unselected
    * source stay inside the engine. The candidate domain is the
    * corpus's source registry — pipeline infrastructure metadata, not
    * user data (the Durfee-Rogers limited-domain correction applies
    * when the domain itself is sensitive). Same [[NoiseModel]]
    * seeded-hash surrogate as every DP rung, so the oracle reproduces
    * both draws bit-for-bit.
    *
    * Scale: one map-side-combined count fold to the source domain
    * (bounded, a handful of rows), then row-local noise and one rank
    * over that domain-bounded frame. */
  private def privacyDpTopk(s: SparkSession, d: String): DataFrame =
    dpTopkOf(Tables.documents(s, d))

  /** [[privacyDpTopk]] over an arbitrary documents-shaped frame. */
  private[graft] def dpTopkOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val epsSel = DpEpsilon / 2.0
    val epsCnt = DpEpsilon / 2.0
    // u strictly inside (0,1) for the Gumbel; (-1,1) for the Laplace
    val uSel = (hash60(concat(lit("dptopk:"), $"source")) % 2000001L + 1L) /
      lit(2000002.0)
    val uCnt = (hash60(concat(lit("dptopkc:"), $"source")) % 2000001L -
      1000000L) / lit(1000001.0)
    val w = Window.orderBy($"score".desc, $"source".asc)
    docs.groupBy($"source").agg(count(lit(1)).as("n"))
      .withColumn("score",
        lit(epsSel / (2.0 * DpTopK)) * $"n" - log(-log(uSel)))
      .withColumn("uc", uCnt)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= DpTopK)
      .select($"rank", $"source",
        roundHalfUp($"n" - lit(DpTopK / epsCnt) * signum($"uc") *
          log(lit(1.0) - abs($"uc")), 6).as("released_count"),
        lit(DpEpsilon).as("epsilon"),
        lit(epsSel).as("epsilon_select"),
        lit(epsCnt).as("epsilon_count"),
        lit(1L).as("sensitivity"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"rank")
  }

  private def dpTopkOracle: String = {
    val uSel = s"((${graft.functions.TextFns.hash60Sql("'dptopk:' || source")}" +
      " % 2000001 + 1) / 2000002.0)"
    val uCnt = s"((${graft.functions.TextFns.hash60Sql("'dptopkc:' || source")}" +
      " % 2000001 - 1000000) / 1000001.0)"
    s"""SELECT CAST(rank AS INT) AS rank, source,
       |  ${roundHalfUpSql(
          s"n - ($DpTopK / ($DpEpsilon / 2.0)) * SIGN($uCnt) * " +
            s"ln(1.0 - ABS($uCnt))", 6)} AS released_count,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  CAST($DpEpsilon / 2.0 AS DOUBLE) AS epsilon_select,
       |  CAST($DpEpsilon / 2.0 AS DOUBLE) AS epsilon_count,
       |  CAST(1 AS BIGINT) AS sensitivity,
       |  '$NoiseModel' AS noise_model
       |FROM (
       |  SELECT source, n,
       |    ROW_NUMBER() OVER (ORDER BY
       |      (($DpEpsilon / 2.0) / (2.0 * $DpTopK)) * n - ln(-ln($uSel))
       |      DESC, source ASC) AS rank
       |  FROM (SELECT source, COUNT(*) AS n FROM documents
       |        GROUP BY source) c) r
       |WHERE rank <= $DpTopK
       |ORDER BY rank""".stripMargin
  }

  // Sparse vector technique: halt after this many above-threshold
  // answers; the probe threshold is a data-independent constant.
  private val SvtC = 3
  private val SvtT = 70.0

  /** ε-DP ABOVE-THRESHOLD probing via the SPARSE VECTOR TECHNIQUE
    * (Dwork & Roth 2014, §3.6 Alg. 2 "Sparse"): walk a SEQUENCE of
    * count queries — per-nation customer cohort sizes, in nation-key
    * order — and release, for each probed query, only whether its
    * noisy value clears a noisy threshold, halting after [[SvtC]]
    * hits. The mechanism the ladder's release rungs don't cover:
    * paying ε for a whole QUERY STREAM costs only the hits (queries
    * answered ⊥ are free beyond the shared threshold noise), which is
    * how a pipeline probes "which cohorts are big enough to release"
    * without spending budget on every cohort. Noise scales are the
    * textbook ones (threshold Lap(2c/ε), re-drawn after each hit;
    * queries Lap(4c/ε); Δ = 1); statuses: `above` (a hit), `below`
    * (probed, didn't clear its epoch's threshold), `not_probed`
    * (after the c-th hit — the halt IS the privacy guarantee). True
    * counts never leave; the threshold [[SvtT]] is a data-independent
    * constant. Same [[NoiseModel]] seeded surrogate as every rung.
    *
    * Scale: one map-side count fold to the nation domain (25 rows),
    * then THREE domain-bounded scalar reductions (the hit positions,
    * broadcast back) and a row-local status CASE — the whole
    * mechanism after the fold is nation-domain-sized. */
  private def privacySvt(s: SparkSession, d: String): DataFrame =
    svtOf(Tables.customer(s, d))

  /** [[privacySvt]] over an arbitrary customer-shaped frame. */
  private[graft] def svtOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val b = 4.0 * SvtC / DpEpsilon
    val bt = 2.0 * SvtC / DpEpsilon
    def lap(scale: Double, u: Column): Column =
      -lit(scale) * signum(u) * log(lit(1.0) - abs(u))
    def uOf(tag: Column): Column =
      (hash60(tag) % 2000001L - 1000000L) / lit(1000001.0)
    val pw = Window.orderBy($"nation_key".asc)
    val g = cust.groupBy($"c_nationkey".cast("long").as("nation_key"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pos", row_number().over(pw))
      .withColumn("nq",
        $"n" + lap(b, uOf(concat(lit("svt_q:"), $"nation_key"))))
    def tHat(k: Int): Column =
      lit(SvtT) + lap(bt, uOf(lit(s"svt_t:$k")))
    val h1f = g.filter($"nq" >= tHat(1)).agg(min($"pos").as("h1"))
    val g1 = g.crossJoin(broadcast(h1f))
    val h2f = g1.filter($"nq" >= tHat(2) && $"pos" > $"h1")
      .agg(min($"pos").as("h2"))
    val g2 = g1.crossJoin(broadcast(h2f))
    val h3f = g2.filter($"nq" >= tHat(3) && $"pos" > $"h2")
      .agg(min($"pos").as("h3"))
    g2.crossJoin(broadcast(h3f))
      .select($"nation_key", $"pos",
        when($"pos" === $"h1" || $"pos" === $"h2" || $"pos" === $"h3",
          "above")
          .when($"h3".isNotNull && $"pos" > $"h3", "not_probed")
          .otherwise("below").as("status"),
        lit(DpEpsilon).as("epsilon"),
        lit(SvtC.toLong).as("c"),
        lit(SvtT).as("threshold"),
        lit(1L).as("sensitivity"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"nation_key")
  }

  private def svtOracle: String = {
    val b = s"(4.0 * $SvtC / $DpEpsilon)"
    val bt = s"(2.0 * $SvtC / $DpEpsilon)"
    def uOf(tag: String): String =
      s"((${graft.functions.TextFns.hash60Sql(tag)}" +
        " % 2000001 - 1000000) / 1000001.0)"
    def lap(scale: String, u: String): String =
      s"(-$scale * SIGN($u) * ln(1.0 - ABS($u)))"
    val nq = s"(n + ${lap(b, uOf("'svt_q:' || nation_key"))})"
    def tHat(k: Int): String =
      s"($SvtT + ${lap(bt, uOf(s"'svt_t:$k'"))})"
    s"""WITH g AS (
       |  SELECT nation_key, n,
       |    ROW_NUMBER() OVER (ORDER BY nation_key ASC) AS pos,
       |    $nq AS nq
       |  FROM (SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
       |          COUNT(*) AS n
       |        FROM customer GROUP BY 1) c
       |),
       |h1 AS (SELECT MIN(pos) AS h1 FROM g WHERE nq >= ${tHat(1)}),
       |h2 AS (SELECT MIN(pos) AS h2 FROM g, h1
       |       WHERE nq >= ${tHat(2)} AND pos > h1.h1),
       |h3 AS (SELECT MIN(pos) AS h3 FROM g, h2
       |       WHERE nq >= ${tHat(3)} AND pos > h2.h2)
       |SELECT g.nation_key, CAST(g.pos AS INT) AS pos,
       |  CASE WHEN g.pos = h1.h1 OR g.pos = h2.h2 OR g.pos = h3.h3
       |         THEN 'above'
       |       WHEN h3.h3 IS NOT NULL AND g.pos > h3.h3 THEN 'not_probed'
       |       ELSE 'below' END AS status,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  CAST($SvtC AS BIGINT) AS c,
       |  CAST($SvtT AS DOUBLE) AS threshold,
       |  CAST(1 AS BIGINT) AS sensitivity,
       |  '$NoiseModel' AS noise_model
       |FROM g, h1, h2, h3
       |ORDER BY g.nation_key""".stripMargin
  }

  private def privacyDpUser(s: SparkSession, d: String): DataFrame =
    dpUserOf(Tables.orders(s, d))

  /** [[privacyDpUser]] over an arbitrary orders-shaped frame
    * (spec hook: plant a user in more groups than the cap). */
  private[graft] def dpUserOf(ord: DataFrame): DataFrame = {
    val s = ord.sparkSession
    import s.implicits._
    val ug = ord.select($"o_custkey".as("u"),
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .distinct()
    val w = Window.partitionBy($"u")
      .orderBy(hash60(concat(lit("dpu:"), $"u".cast("string"), lit("|"),
        $"month")).asc, $"month".asc)
    val u = (hash60(concat(lit("dpuser:"), $"month")) % 2000001L -
      1000000L) / lit(1000001.0)
    ug.withColumn("rn", row_number().over(w))
      .filter($"rn" <= DpUserL0Cap)
      .groupBy($"month").agg(count(lit(1)).as("k"))
      .withColumn("uu", u)
      .select($"month",
        roundHalfUp($"k" - lit(DpUserL0Cap / DpEpsilon) * signum($"uu") *
          log(lit(1.0) - abs($"uu")), 6).as("noisy_count"),
        lit(DpEpsilon).as("epsilon"),
        lit(DpUserL0Cap.toLong).as("l0_cap"),
        lit(DpUserL0Cap.toLong).as("sensitivity"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"month")
  }

  private def dpUserOracle: String = {
    val uExpr = s"((${graft.functions.TextFns.hash60Sql(
      "'dpuser:' || month")} % 2000001 - 1000000) / 1000001.0)"
    s"""WITH ug AS (
       |  SELECT DISTINCT o_custkey AS u,
       |    strftime(o_orderdate, '%Y-%m') AS month
       |  FROM orders
       |),
       |capped AS (
       |  SELECT u, month FROM (
       |    SELECT u, month, ROW_NUMBER() OVER (PARTITION BY u
       |      ORDER BY ${graft.functions.TextFns.hash60Sql(
           "'dpu:' || CAST(u AS VARCHAR) || '|' || month")} ASC,
       |        month ASC) AS rn
       |    FROM ug) t
       |  WHERE rn <= $DpUserL0Cap
       |),
       |cnt AS (SELECT month, COUNT(*) AS k FROM capped GROUP BY month)
       |SELECT month,
       |  ${roundHalfUpSql(
          s"k - ($DpUserL0Cap / $DpEpsilon) * SIGN($uExpr) * " +
            s"ln(1.0 - ABS($uExpr))", 6)} AS noisy_count,
       |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
       |  CAST($DpUserL0Cap AS BIGINT) AS l0_cap,
       |  CAST($DpUserL0Cap AS BIGINT) AS sensitivity,
       |  '$NoiseModel' AS noise_model
       |FROM cnt
       |ORDER BY month""".stripMargin
  }

  // Public candidate domain for the exponential-mechanism median: a
  // fixed grid over the clipped balance range. The domain must be
  // DATA-INDEPENDENT (a grid, not the observed values) or the
  // mechanism leaks through its own candidate set.
  private val DpMedianGrid: Seq[Double] = (0 to 20).map(_ * 250.0)

  /** ε-DP released MEDIANS via the EXPONENTIAL MECHANISM (McSherry &
    * Talwar 2007, FOCS — "Mechanism Design via Differential Privacy")
    * — the third mechanism class in the privacy ladder (Laplace
    * counts, clipped-Laplace sums, now a non-numeric-noise release):
    * per released QI group, every grid candidate v scores
    * u(v) = −|#{x<v} − #{x>v}| (utility sensitivity 1 — one person
    * moves the imbalance by at most 1), and the released median is
    * the Gumbel-max draw argmax(ε·u/2 + G) — distributionally the
    * textbook exp(ε·u/2) sampler, with the Gumbel noise derived from
    * the same seeded-hash surrogate as the Laplace rungs so the
    * DuckDB oracle reproduces the draw bit-for-bit. Composes with the
    * SAME generalization ladder; true order statistics never leave
    * the engine.
    *
    * Scale: one fold over customers × the CONSTANT grid (21
    * candidates — the explode is a fixed fan-out, not a join), then a
    * QI-domain-bounded argmax window. */
  private def privacyDpMedian(s: SparkSession, d: String): DataFrame =
    dpMedianOf(Tables.customer(s, d))

  /** [[privacyDpMedian]] over an arbitrary customer-shaped frame. */
  private[graft] def dpMedianOf(cust: DataFrame): DataFrame = {
    val s = cust.sparkSession
    import s.implicits._
    val level = minGenLevel(cust)
    val (nat, seg, band) = genQi(cust, level)
    val clip = least(greatest($"c_acctbal", lit(0.0)), lit(DpClip))
    val scored = cust
      .select(nat.as("qi_nation"), seg.as("qi_segment"),
        band.as("qi_band"), clip.as("v"),
        explode(array(DpMedianGrid.map(lit): _*)).as("cand"))
      .groupBy($"qi_nation", $"qi_segment", $"qi_band", $"cand")
      .agg((sum(when($"v" < $"cand", 1L).otherwise(0L)) -
        sum(when($"v" > $"cand", 1L).otherwise(0L))).as("imb"))
    // u strictly inside (0,1) so both logs are finite
    val u = (hash60(concat(lit("dpmed:"), $"qi_nation", lit("|"),
      $"qi_segment", lit("|"), $"qi_band", lit("|"),
      $"cand".cast("string"))) % 2000001L + 1L) / lit(2000002.0)
    val w = Window.partitionBy($"qi_nation", $"qi_segment", $"qi_band")
      .orderBy($"score".desc, $"cand".asc)
    scored
      .withColumn("score",
        lit(DpEpsilon / 2.0) * -abs($"imb") - log(-log(u)))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"qi_nation", $"qi_segment", $"qi_band",
        $"cand".as("released_median"),
        lit(DpEpsilon).as("epsilon"),
        lit(1L).as("utility_sensitivity"),
        lit(level).as("gen_level"),
        lit(NoiseModel).as("noise_model"))
      .orderBy($"qi_nation", $"qi_segment", $"qi_band")
  }

  private def dpMedianOracle: String = {
    val uExpr = s"((${graft.functions.TextFns.hash60Sql(
      "'dpmed:' || qi_nation || '|' || qi_segment || '|' || qi_band || " +
        "'|' || CAST(cand AS VARCHAR)")}" +
      s" % 2000001 + 1) / 2000002.0)"
    genLadderSql(l =>
      s"""SELECT qi_nation, qi_segment, qi_band, released_median,
         |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
         |  CAST(1 AS BIGINT) AS utility_sensitivity,
         |  CAST($l AS INT) AS gen_level,
         |  '$NoiseModel' AS noise_model
         |FROM (
         |  SELECT qi_nation, qi_segment, qi_band, cand AS released_median,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY qi_nation, qi_segment, qi_band
         |      ORDER BY ($DpEpsilon / 2.0) * -ABS(imb) - ln(-ln($uExpr))
         |        DESC, cand ASC) AS rk
         |  FROM (
         |    SELECT r.qi_nation, r.qi_segment, r.qi_band,
         |      CAST(t.cand AS DOUBLE) AS cand,
         |      CAST(SUM(CASE WHEN r.v < t.cand THEN 1 ELSE 0 END) -
         |           SUM(CASE WHEN r.v > t.cand THEN 1 ELSE 0 END)
         |        AS BIGINT) AS imb
         |    FROM r$l r CROSS JOIN (
         |      SELECT CAST(k * 250 AS DOUBLE) AS cand
         |      FROM range(0, 21) t(k)) t
         |    GROUP BY 1, 2, 3, 4
         |  ) s
         |) ranked
         |WHERE rk = 1 AND (SELECT lv FROM sel) = $l""".stripMargin,
      rawCtes = true)
  }

  private def dpSumOracle: String = {
    val uExpr = s"((${graft.functions.TextFns.hash60Sql(
      "'dpsum:' || qi_nation || '|' || qi_segment || '|' || qi_band")}" +
      s" % 2000001 - 1000000) / 1000001.0)"
    genLadderSql(l =>
      s"""SELECT qi_nation, qi_segment, qi_band,
         |  ${roundHalfUpSql(
            s"s_clip - ($DpClip / $DpEpsilon) * SIGN($uExpr) * " +
              s"ln(1.0 - ABS($uExpr))", 6)} AS noisy_sum,
         |  CAST($DpEpsilon AS DOUBLE) AS epsilon,
         |  CAST($DpClip AS DOUBLE) AS sensitivity,
         |  CAST($l AS INT) AS gen_level,
         |  '$NoiseModel' AS noise_model
         |FROM g$l WHERE (SELECT lv FROM sel) = $l""".stripMargin,
      gExtra = ",\n    CAST(SUM(CAST(LEAST(GREATEST(c_acctbal, 0.0), " +
        s"$DpClip) AS DECIMAL(27,6))) AS DOUBLE) AS s_clip")
  }

  private def kanonymityOracle: String =
    s"""WITH per_sens AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    c_acctbal, COUNT(*) AS c
       |  FROM customer
       |  GROUP BY c_nationkey, c_mktsegment, bal_band, c_acctbal
       |)
       |SELECT c_nationkey, c_mktsegment, bal_band,
       |  CAST(SUM(c) AS BIGINT) AS k,
       |  COUNT(*) AS l_distinct,
       |  (CAST(SUM(c) AS BIGINT) < $KAnonMin OR COUNT(*) < 2) AS at_risk
       |FROM per_sens
       |GROUP BY c_nationkey, c_mktsegment, bal_band
       |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("privacy_kanonymity", privacyKanonymity _, kanonymityOracle),
    OpDef("privacy_generalize", privacyGeneralize _, generalizeOracle),
    OpDef("privacy_dp_counts", privacyDpCounts _, dpCountsOracle),
    OpDef("privacy_dp_sum", privacyDpSum _, dpSumOracle),
    OpDef("privacy_dp_median", privacyDpMedian _, dpMedianOracle),
    OpDef("privacy_dp_topk", privacyDpTopk _, dpTopkOracle),
    OpDef("privacy_svt", privacySvt _, svtOracle),
    OpDef("privacy_ldp_frequency", privacyLdpFrequency _, ldpFrequencyOracle),
    OpDef("privacy_dp_user", privacyDpUser _, dpUserOracle),
    OpDef("quality_ensemble", qualityEnsemble _, qualityEnsembleOracle),
    OpDef("corpus_token_budget", corpusTokenBudget _, tokenBudgetOracle),
    OpDef("corpus_mix_temperature", corpusMixTemperature _,
      s"""WITH per_lang AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(len(${tokensSql("text")})) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang
         |),
         |total AS (
         |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per_lang
         |),
         |w AS (
         |  SELECT lang, n_docs, n_tokens,
         |    CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS p,
         |    CAST(SQRT(CAST(n_tokens AS DOUBLE) /
         |              CAST(tot_tokens AS DOUBLE)) AS DECIMAL(27,6)) AS w
         |  FROM per_lang, total
         |),
         |dnm AS (SELECT SUM(w) AS denom FROM w)
         |SELECT lang, n_docs, n_tokens,
         |  ${roundHalfUpSql("p", 6)} AS token_share,
         |  CAST(w AS DOUBLE) AS temp_weight,
         |  ${roundHalfUpSql(
            "CAST(w AS DOUBLE) / CAST(denom AS DOUBLE)", 6)} AS sample_share,
         |  ${roundHalfUpSql(
            "(CAST(w AS DOUBLE) / CAST(denom AS DOUBLE)) / p",
            6)} AS epochs
         |FROM w, dnm
         |ORDER BY lang""".stripMargin),
    OpDef("corpus_mix_report", corpusMixReport _,
      s"""WITH per_lang AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(len(${tokensSql("text")})) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang
         |),
         |total AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per_lang),
         |target(lang, target_pm) AS (VALUES ${LangTargetPermille
           .map { case (l, pm) => s"('$l', $pm)" }.mkString(", ")})
         |SELECT p.lang, p.n_docs, p.n_tokens,
         |  ${roundHalfUpSql("1.0 * p.n_tokens / t.tot_tokens", 6)} AS token_share,
         |  CAST(COALESCE(g.target_pm, 0) AS BIGINT) AS target_permille,
         |  ${roundHalfUpSql(
             "LEAST(1.0, (COALESCE(g.target_pm, 0) / 1000.0) / (1.0 * p.n_tokens / t.tot_tokens))", 6)} AS sample_rate,
         |  ${roundHalfUpSql(
             "(COALESCE(g.target_pm, 0) / 1000.0) / (1.0 * p.n_tokens / t.tot_tokens)", 6)} AS epochs
         |FROM per_lang p CROSS JOIN total t
         |LEFT JOIN target g ON g.lang = p.lang
         |ORDER BY p.lang""".stripMargin),
    OpDef("corpus_temperature_mix", corpusTemperatureMix _,
      temperatureMixOracle),
    OpDef("sample_reservoir", sampleReservoir _,
      s"""SELECT doc_id, source, pri FROM (
         |  SELECT doc_id, source,
         |    ${hash60Sql("'rsv:' || doc_id")} AS pri
         |  FROM documents
         |  ORDER BY pri ASC, doc_id ASC LIMIT $ReservoirK
         |)
         |ORDER BY doc_id""".stripMargin),
    OpDef("sample_stratified", sampleStratified _,
      s"""WITH quotas AS (
         |  SELECT lang, CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS quota
         |  FROM documents GROUP BY lang
         |),
         |ranked AS (
         |  SELECT doc_id, lang,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY ${hash60Sql("'strat:' || doc_id")} ASC, doc_id ASC)
         |      AS BIGINT) AS strat_rank
         |  FROM documents
         |)
         |SELECT r.doc_id, r.lang, r.strat_rank, q.quota
         |FROM ranked r JOIN quotas q ON q.lang = r.lang
         |WHERE r.strat_rank <= q.quota
         |ORDER BY r.doc_id""".stripMargin),
    OpDef("sample_weighted", sampleWeighted _,
      s"""WITH rated AS (
         |  SELECT doc_id, source,
         |    CASE ${MixPermille.map { case (src, pm) =>
             s"WHEN source = '$src' THEN $pm" }.mkString(" ")}
         |      ELSE $DefaultPermille END AS mix_permille
         |  FROM documents
         |)
         |SELECT doc_id, source, CAST(mix_permille AS BIGINT) AS mix_permille
         |FROM rated
         |WHERE ${hash60Sql("'mix:' || doc_id")} % 1000 < mix_permille
         |ORDER BY doc_id""".stripMargin),
    OpDef("quality_classifier", qualityClassifier _, qualityClassifierOracle),
    OpDef("quality_calibration", qualityCalibration _,
      qualityCalibrationOracle),
    OpDef("quality_gate", qualityGate _,
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    COALESCE(${roundHalfUpSql(
              s"1.0 * len(regexp_replace(${normalizeTextSql("text")}, '[^a-z]', '', 'g')) " +
              s"/ nullif(len(${normalizeTextSql("text")}), 0)", 6)}, 0.0) AS quality
         |  FROM documents
         |),
         |ranked AS (
         |  SELECT doc_id, source, quality,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY quality ASC, doc_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n
         |  FROM scored
         |)
         |SELECT doc_id, source, quality FROM ranked
         |WHERE rn > n // 4
         |ORDER BY doc_id""".stripMargin),
    OpDef("domain_cap", domainCap _,
      s"""WITH ranked AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${hash60Sql("'cap:' || doc_id")} ASC, doc_id ASC)
         |      AS BIGINT) AS cap_rank
         |  FROM documents
         |)
         |SELECT doc_id, source, cap_rank FROM ranked
         |WHERE cap_rank <= $DomainCap
         |ORDER BY doc_id""".stripMargin),
    OpDef("domain_cap_salted", domainCapSalted _,
      s"""WITH ranked AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${hash60Sql("'cap:' || doc_id")} ASC, doc_id ASC)
         |      AS BIGINT) AS cap_rank
         |  FROM documents
         |)
         |SELECT doc_id, source, cap_rank FROM ranked
         |WHERE cap_rank <= $DomainCap
         |ORDER BY doc_id""".stripMargin),
    OpDef("dsir_select", dsirSelect _, dsirOracle),
    OpDef("corpus_shuffle", corpusShuffle _,
      s"""WITH hashed AS (
         |  SELECT doc_id, ${hash60Sql("'shuf:e0:' || doc_id")} AS h
         |  FROM documents
         |)
         |SELECT doc_id, h % $ShuffleShards AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY h % $ShuffleShards
         |    ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos
         |FROM hashed
         |ORDER BY shard, pos""".stripMargin)
  )
}
