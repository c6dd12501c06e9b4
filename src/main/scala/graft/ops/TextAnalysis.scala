package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.GraftFunctions
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Text analysis over the `documents` table (SURVEY §2.9): the
  * per-document statistics, quality scores, language heuristics and
  * fingerprints a training-data pipeline computes before filtering.
  *
  * Scale design: every op is one codegen'd scan plus at most one
  * aggregation shuffle. Per-document measures (stats, quality,
  * fingerprint, language ID) are computed row-local — token arrays
  * never leave the row, so there is NO shuffle at all and the scan
  * parallelizes embarrassingly. The one corpus-wide op (top-k terms)
  * explodes tokens but partial-aggregates map-side, so the shuffle
  * carries per-(partition, term) rows, not per-token rows.
  */
object TextAnalysis {

  // Tiny per-language stopword lists for the n-gram/stopword language
  // heuristic. Overlapping entries (e.g. 'la', 'que') are fine — the
  // argmax with a fixed tie-break keeps the result deterministic.
  private[ops] val En = Seq("the", "a", "and", "of", "to", "in", "is", "you", "that", "it")
  private val De = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu")
  private val Fr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  private val Es = Seq("el", "los", "las", "y", "es", "este", "una", "en", "se", "por")

  private[ops] def inListSql(c: String, ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(s"$c IN (", ", ", ")")

  /** Per-document token/length statistics — row-local, no shuffle. */
  // Entropy gate: below this many bits/letter the text is dominated by
  // a few characters (aaaa…, base64-ish runs, template junk). English
  // prose sits near 4.1; the gate is deliberately loose.
  private val EntropyMin = 3.0

  /** Character-entropy quality signal: Shannon entropy (bits/char) of
    * the letter distribution of the normalized text — the cheap
    * anti-gibberish gate that catches repeated-character junk and
    * degenerate templates whose length/stopword stats look fine.
    *
    * Scale: entirely row-local — ONE codegen'd `letter_counts` byte
    * scan builds all 26 counts + total (the 26-separate-regexp
    * formulation measured 12.3 s at the 10× rehearsal; this one 0.7 s),
    * then an entropy sum over the 26 terms in FIXED literal order
    * (both engines fold left over identical doubles), zero shuffle
    * before the output sort. Quantized to 6 dp. */
  private def textEntropy(s: SparkSession, d: String) = {
    graft.expressions.GraftFunctions.ensure(s)
    import s.implicits._
    // one codegen'd byte scan builds all 26 counts + total (lc[26]);
    // the entropy sum unrolls over the array in FIXED literal order so
    // both engines fold identical doubles left-to-right — the oracle
    // keeps the 26-replace formulation over the same counts
    val ent = (0 until 26).map { i =>
      val c = $"lc".getItem(i)
      val p = c / $"n_letters"
      when(c > 0, -p * log(p) / log(lit(2.0))).otherwise(lit(0.0))
    }.reduce(_ + _)
    Tables.documents(s, d)
      .select($"doc_id", normalizeText($"text").as("norm"))
      .select($"doc_id", expr("letter_counts(norm)").as("lc"))
      .withColumn("n_letters", $"lc".getItem(26))
      .filter($"n_letters" > 0)
      .select($"doc_id", $"n_letters",
        roundHalfUp(ent, 6).as("entropy"))
      .withColumn("keep", $"entropy" >= EntropyMin)
      .orderBy($"doc_id")
  }

  private def entropyOracle: String = {
    val letters = ('a' to 'z').toSeq
    val counts = letters.map(c =>
      s"CAST(len(norm) - len(replace(norm, '$c', '')) AS BIGINT) AS c_$c")
      .mkString(",\n    ")
    val total = letters.map(c => s"c_$c").mkString(" + ")
    val ent = letters.map(c =>
      s"CASE WHEN c_$c > 0 THEN -(1.0 * c_$c / n_letters) * " +
        s"ln(1.0 * c_$c / n_letters) / ln(2.0) ELSE 0.0 END")
      .mkString(" + ")
    s"""WITH norm AS (
       |  SELECT doc_id, ${normalizeTextSql("text")} AS norm FROM documents
       |),
       |counted AS (
       |  SELECT doc_id,
       |    $counts
       |  FROM norm
       |),
       |tot AS (
       |  SELECT *, $total AS n_letters FROM counted
       |)
       |SELECT doc_id, n_letters,
       |  ${roundHalfUpSql(ent, 6)} AS entropy,
       |  ${roundHalfUpSql(ent, 6)} >= $EntropyMin AS keep
       |FROM tot
       |WHERE n_letters > 0
       |ORDER BY doc_id""".stripMargin
  }

  private def textStats(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"),
        length(normalizeText($"text")).cast("long").as("n_chars_norm"))
      .select($"doc_id",
        size($"w").cast("long").as("n_tokens"),
        $"n_chars_norm",
        roundHalfUp(
          lit(1.0) * length(array_join($"w", "")) / size($"w"), 6)
          .as("avg_token_len"))
      .orderBy($"doc_id")
  }

  /** Corpus-wide top-20 terms by occurrence (deterministic tie-break
    * on the term). Map-side partial aggregation keeps the shuffle at
    * per-(partition, term) rows; the global top-k is a single-stage
    * TakeOrdered, never a full sort. */
  private def topkTerms(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(tokens($"text")).as("term"))
      .groupBy($"term")
      .agg(count(lit(1)).as("occurrences"))
      .orderBy($"occurrences".desc, $"term".asc)
      .limit(20)
  }

  private val SrcTermMin = 5L // lift is noise below this in-source count
  private val SrcTermK = 5 // distinctive terms reported per source

  /** Per-source DISTINCTIVE terms — the "what characterizes this
    * feed" report a curator reads next to `corpus_mix_report` before
    * weighting sources (the corpus-analysis habit behind Monroe et
    * al.'s fighting-words method, here with the simpler add-one-
    * smoothed rate LIFT): for each (source, term) with at least
    * [[SrcTermMin]] in-source occurrences,
    * `lift = ((y+1)/(n_s+V)) / ((Y−y+1)/(N−n_s+V))` — the term's
    * smoothed rate inside the source over its rate everywhere else —
    * and the top [[SrcTermK]] terms per source by lift. Exact integer
    * counts into one float division per row (identical literal order
    * both engines), so the rank is deterministic.
    *
    * Scale: one explode + (source, term) map-side-combined fold, one
    * vocab-sized term fold, V/N/per-source totals as broadcast-sized
    * frames; the per-source rank is a keyed WindowGroupLimit. */
  private def textSourceTerms(s: SparkSession, d: String) = {
    import s.implicits._
    val inst = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("term"))
    val st = inst.groupBy($"source", $"term")
      .agg(count(lit(1)).as("y")).cache()
    val tTot = st.groupBy($"term").agg(sum($"y").as("yt"))
    val sTot = st.groupBy($"source").agg(sum($"y").as("ns"))
    // two-level fold off tTot (rows = V, Σyt = N): mixing SUM with
    // COUNT(DISTINCT) in one aggregate plans a distinct Expand that
    // doubles the vocab-sized shuffle — this keeps both stages
    // map-side combined (tTot re-derives off the cached st)
    val gl = tTot.agg(sum($"yt").as("n_all"),
      count(lit(1)).as("v")) // 1 row
    val w = Window.partitionBy($"source")
      .orderBy($"lift".desc, $"term".asc)
    val out = st.filter($"y" >= SrcTermMin)
      .join(tTot, "term")
      .join(broadcast(sTot), "source")
      .crossJoin(broadcast(gl))
      .withColumn("lift", roundHalfUp(
        ((($"y" + 1L) * lit(1.0)) / ($"ns" + $"v")) /
          ((($"yt" - $"y" + 1L) * lit(1.0)) / ($"n_all" - $"ns" + $"v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= SrcTermK)
      .select($"source", $"rank".cast("int").as("rank"), $"term",
        $"y".as("n_in_source"), $"lift")
      .orderBy($"source", $"rank")
      // sources × SrcTermK rows: eager-checkpoint, then drop the cache
      // so repeated calls don't accumulate blocks
      .localCheckpoint()
    st.unpersist(false)
    out
  }

  private def sourceTermsOracle: String =
    s"""WITH inst AS (
       |  SELECT source, unnest(${tokensSql("text")}) AS term
       |  FROM documents
       |),
       |st AS (
       |  SELECT source, term, COUNT(*) AS y FROM inst GROUP BY source, term
       |),
       |tt AS (SELECT term, SUM(y) AS yt FROM st GROUP BY term),
       |stot AS (SELECT source, SUM(y) AS ns FROM st GROUP BY source),
       |gl AS (
       |  SELECT SUM(y) AS n_all, COUNT(DISTINCT term) AS v FROM st
       |),
       |scored AS (
       |  SELECT s.source, s.term, s.y,
       |    ${roundHalfUpSql(
            "(((s.y + 1) * 1.0) / (o.ns + g.v)) / " +
              "(((t.yt - s.y + 1) * 1.0) / (g.n_all - o.ns + g.v))", 6)}
       |      AS lift
       |  FROM st s
       |  JOIN tt t ON t.term = s.term
       |  JOIN stot o ON o.source = s.source
       |  CROSS JOIN gl g
       |  WHERE s.y >= $SrcTermMin
       |)
       |SELECT source, CAST(rank AS INT) AS rank, term,
       |  y AS n_in_source, lift
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY lift DESC, term ASC) AS rank
       |  FROM scored)
       |WHERE rank <= $SrcTermK
       |ORDER BY source, rank""".stripMargin

  private val HhFraction = 50 // heavy = frequency > N/HhFraction

  /** Heavy-hitter terms via the sketch→verify shape: a Misra-Gries
    * candidate pass ([[graft.expressions.MgTopKCandidates]] — each
    * partition keeps ≤ 64 counters, merge shuffles capacity-bounded
    * buffers, never the vocabulary), then an EXACT recount of only the
    * ≤ 64 broadcast candidates, thresholded at N/[[HhFraction]].
    * MG guarantees every term above N/capacity survives the sketch
    * regardless of merge order, and the threshold sits above that
    * bound, so the final output is exactly the true heavy hitters —
    * deterministic, and oracle-checkable as a plain GROUP BY/HAVING.
    * At corpus scale this replaces a full-vocabulary groupBy with two
    * scans whose shuffles are both O(capacity). */
  private def textHeavyHitters(s: SparkSession, d: String) = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val toks = Tables.documents(s, d)
      .select(explode(tokens($"text")).as("term"))
    val cands = toks.agg(expr("mg_topk_candidates(term)").as("cs"))
      .select(explode($"cs").as("term"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy($"term").agg(count(lit(1)).as("occurrences"))
      .crossJoin(broadcast(total))
      .filter($"occurrences" > $"n_total" / HhFraction)
      .select($"term", $"occurrences")
      .orderBy($"occurrences".desc, $"term".asc)
  }

  private val VocabK = 16

  /** Per-document vocabulary coverage / OOV rate against the corpus
    * top-[[VocabK]] vocabulary — the tokenizer-fit statistic a
    * training pipeline tracks per source (a rising OOV rate means the
    * vocabulary no longer fits the incoming data). The vocabulary is
    * a corpus-frequency top-k (deterministic tie-break) and
    * BROADCASTS to the per-doc token stream; coverage resolves in the
    * same doc-keyed aggregate that counts tokens, so the whole op is
    * two scans + one K-row broadcast at any corpus size. */
  private def textVocabCoverage(s: SparkSession, d: String) = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("term"))
    val vocab = toks.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term".asc).limit(VocabK)
      .select($"term", lit(1).as("inv"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum($"inv"), lit(0)).cast("long").as("n_in_vocab"))
      .select($"doc_id", $"n_tokens", $"n_in_vocab",
        roundHalfUp(lit(1.0) - lit(1.0) * $"n_in_vocab" / $"n_tokens", 6)
          .as("oov_rate"))
      .orderBy($"doc_id")
  }

  // Inverted index: bound the emitted posting chunk and drop the
  // hapax/noise tail so the output is the index HEAD a retrieval layer
  // would actually serve.
  private val IdxDfMin = 5
  private val IdxPostings = 8

  /** Inverted index (term → document postings): the retrieval-side twin
    * of top-k terms. One explode plus ONE shuffle on the term key;
    * distinctness, document frequency, and the (sorted, capped) posting
    * chunk all resolve inside the same hash aggregate, map-side
    * partial-aggregated. At 100 TB the index is doc-sharded (each shard
    * builds postings for its doc range — the Lucene segment model), so
    * no global per-term list ever materializes; this op is one shard's
    * build. Postings are capped at [[IdxPostings]] smallest doc_ids
    * (chunked-postings realism) and terms below [[IdxDfMin]] df are
    * dropped (hapax noise). */
  private def invertedIndex(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"term")
      // df is the cardinality of the same distinct set the postings
      // come from — deriving it via size() instead of count_distinct
      // avoids the extra (term, doc_id) expand shuffle Spark plans for
      // a distinct aggregate alongside collect_set.
      .agg(expr("array_sort(collect_set(doc_id))").as("ds"))
      .select($"term", size($"ds").cast("long").as("df"),
        expr(s"array_join(transform(slice(ds, 1, $IdxPostings), x -> cast(x AS string)), ',')")
          .as("postings"))
      .filter($"df" >= IdxDfMin)
      .orderBy($"term")
  }

  /** Adjacent-token-pair frequencies — the merge-candidate statistic at
    * the core of BPE/WordPiece vocabulary training (each BPE round
    * merges the current top pair). Pairs come from the codegen'd
    * 2-shingle expression (row-local, token arrays never leave the
    * row); the count is a map-side-combined aggregate on the pair key
    * and the top-30 a TakeOrdered, never a full sort — the exact shape
    * a vocab-training round runs per iteration at corpus scale. */
  private def bpePairStats(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    Tables.documents(s, d)
      .select(tokens($"text").as("w"))
      .select(explode(wordShingles("w", 2)).as("pair"))
      .groupBy($"pair")
      .agg(count(lit(1)).as("occurrences"))
      .orderBy($"occurrences".desc, $"pair".asc)
      .limit(30)
  }

  /** Per-document quality scoring — character-class ratios and a
    * boolean keep-flag, all row-local. */
  private def textQuality(s: SparkSession, d: String) = {
    import s.implicits._
    val n = length($"norm")
    def ratio(c: Column) = roundHalfUp(lit(1.0) * c / nullif(n, lit(0)), 6)
    Tables.documents(s, d)
      .select($"doc_id", normalizeText($"text").as("norm"),
        tokens($"text").as("w"))
      .select($"doc_id",
        ratio(length(regexp_replace($"norm", "[^a-z]", ""))).as("alpha_ratio"),
        ratio(length(regexp_replace($"norm", "[^0-9]", ""))).as("digit_ratio"),
        roundHalfUp(lit(1.0) *
          size(expr(s"filter(w, t -> ${En.map(w => s"t = '$w'").mkString(" OR ")})")) /
          nullif(size($"w"), lit(0)), 6).as("stopword_ratio"),
        (size($"w") >= 5 &&
          length(regexp_replace($"norm", "[^a-z]", "")) * lit(10) >= n * lit(6))
          .as("keep"))
      .orderBy($"doc_id")
  }

  /** Gopher-style document quality rule battery (Rae et al. 2021,
    * arXiv:2112.11446, Appendix A — the doc-level gates modern
    * pretraining pipelines run before anything model-based): word
    * count in [50, 100k], mean word length in [3, 10], a minimum
    * distinct-word fraction (the duplicate-content analog of Gopher's
    * repetition rules), and a required stop-word hit count. Gopher
    * demands ≥ 2 of its 8 stop words; this corpus's vocabulary only
    * carries [[En]]'s article, so the gate is ≥ 1 distinct hit over
    * [[En]] — same rule shape, corpus-calibrated threshold. Every
    * rule's measured VALUE is emitted alongside the verdict so
    * downstream curation can re-gate at different thresholds without
    * rescanning the corpus.
    *
    * Mean word length rides the normalized text's single-space
    * invariant (Σ word lengths = len(norm) − n + 1) — no lambda pass
    * over the token array on either engine.
    *
    * Scale: entirely row-local (one projection; the only shuffle is
    * the output sort) — the 100 TB profile is a scan at parquet
    * bandwidth. */
  /** The Gopher battery over an arbitrary (doc_id, text) frame —
    * shared by the catalog op and the v3 prep chain's gate. */
  private[graft] def gopherFlagsOf(s: SparkSession, docs: DataFrame)
      : DataFrame = {
    import s.implicits._
    val enArr = array(En.map(lit): _*)
    docs
      .select($"doc_id", normalizeText($"text").as("norm"),
        tokens($"text").as("w"))
      .select($"doc_id",
        size($"w").cast("long").as("n_words"),
        roundHalfUp(lit(1.0) * (length($"norm") - size($"w") + lit(1)) /
          nullif(size($"w"), lit(0)), 6).as("mean_word_len"),
        roundHalfUp(lit(1.0) * size(array_distinct($"w")) /
          nullif(size($"w"), lit(0)), 6).as("frac_unique_words"),
        size(array_intersect($"w", enArr)).cast("long").as("stop_hits"))
      .withColumn("keep",
        $"n_words".between(50L, 100000L) &&
          $"mean_word_len".between(3.0, 10.0) &&
          $"frac_unique_words" >= 0.4 && $"stop_hits" >= 1L)
  }

  private def textGopherRules(s: SparkSession, d: String) = {
    import s.implicits._
    gopherFlagsOf(s, Tables.documents(s, d)).orderBy($"doc_id")
  }

  /** Gopher CTE pair for oracle reuse: `${px}base` (normalized +
    * tokenized docs) and `${px}m` (the measured battery). */
  private def gopherCtes(px: String): String =
    s"""${px}base AS (
       |  SELECT doc_id, ${normalizeTextSql("text")} AS norm,
       |    ${tokensSql("text")} AS w
       |  FROM documents
       |),
       |${px}m AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    ${roundHalfUpSql(
          "1.0 * (len(norm) - len(w) + 1) / NULLIF(len(w), 0)", 6)} AS mean_word_len,
       |    ${roundHalfUpSql(
          "1.0 * len(list_distinct(w)) / NULLIF(len(w), 0)", 6)} AS frac_unique_words,
       |    CAST(len(list_intersect(w, [${En.map(w => s"'$w'")
          .mkString(", ")}])) AS BIGINT) AS stop_hits
       |  FROM ${px}base
       |)""".stripMargin

  /** The battery's keep predicate over a `${px}m` row. */
  private def gopherKeepSql: String =
    "(n_words BETWEEN 50 AND 100000" +
      " AND mean_word_len BETWEEN 3.0 AND 10.0" +
      " AND frac_unique_words >= 0.4 AND stop_hits >= 1)"

  // GPT-2-style pre-tokenizer shape: letter runs (case-split), digit
  // runs, and single punctuation marks. Plain alternation only, so the
  // pattern means the same thing to Java regex and DuckDB's RE2.
  private val BpeIshPattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token counting under two tokenizers — plain whitespace vs a
    * BPE-ish pre-tokenizer regex — the standard "how many tokens will
    * training see" estimate. Row-local, no shuffle. */
  private def textTokensBpe(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("ws"),
        expr(s"regexp_extract_all(text, '${BpeIshPattern.replace("\\", "\\\\")}', 0)").as("bpe"))
      .select($"doc_id",
        size($"ws").cast("long").as("n_ws_tokens"),
        size($"bpe").cast("long").as("n_bpe_tokens"),
        roundHalfUp(lit(1.0) * size($"bpe") / nullif(size($"ws"), lit(0)), 6)
          .as("bpe_per_ws"))
      .orderBy($"doc_id")
  }

  /** `array_count_in` call against a fixed word list. */
  private def hitsIn(arr: String, ws: Seq[String], as: String): Column =
    expr(s"array_count_in($arr, array(${ws.map(w => s"'$w'").mkString(", ")}))")
      .as(as)

  /** Stopword-hit language identification: occurrence counts against
    * four tiny stopword lists, argmax with fixed tie-break en>de>fr>es.
    * Hit counts are per-row measures, so they are computed row-locally
    * by the codegen'd `array_count_in` — NO explode, NO doc-keyed
    * aggregation shuffle; the empty-token filter preserves the
    * oracle's unnest semantics (tokenless docs drop out). */
  private def textLangid(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val hits = Tables.documents(s, d)
      .select($"doc_id", $"lang", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", $"lang",
        hitsIn("w", En, "en_hits"), hitsIn("w", De, "de_hits"),
        hitsIn("w", Fr, "fr_hits"), hitsIn("w", Es, "es_hits"))
    hits.select($"doc_id", $"lang",
        when($"en_hits" >= $"de_hits" && $"en_hits" >= $"fr_hits" &&
          $"en_hits" >= $"es_hits", "en")
          .when($"de_hits" >= $"fr_hits" && $"de_hits" >= $"es_hits", "de")
          .when($"fr_hits" >= $"es_hits", "fr")
          .otherwise("es").as("pred_lang"),
        $"en_hits", $"de_hits", $"fr_hits", $"es_hits")
      .orderBy($"doc_id")
  }

  /** Per-document fingerprint: minimum 60-bit hash of the char-8-gram
    * set (a 1-member minhash — the standard document-sketch primitive)
    * plus the distinct-gram count. Entirely row-local via the codegen'd
    * `hash60_set`: the gram set never leaves the row. */
  private def textFingerprint(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", normalizeText($"text").as("norm"))
      .filter(length($"norm") >= 8)
      .select($"doc_id", expr("hash60_set(char_ngrams(norm, 8))").as("gs"))
      .select($"doc_id",
        element_at($"gs", 1).as("fingerprint"),
        size($"gs").cast("long").as("n_grams"))
      .orderBy($"doc_id")
  }

  // Character-trigram profiles (space-padded, the classic Cavnar-
  // Trenkle shape): high-frequency trigrams per language.
  private val EnTri = Seq("the", "he ", " th", "ing", "and", "ed ", " an", "er ", "nt ", " of")
  private val DeTri = Seq("der", "ein", "ich", "sch", "die", "und", "en ", "ch ", " de", "ung")
  private val FrTri = Seq("les", " le", "ent", "ion", "es ", " la", "ait", "que", "eur", " pa")
  private val EsTri = Seq("os ", "ión", "la ", "el ", " co", "as ", " es", "ado", "nte", " po")

  /** `str_count_any` call against a fixed trigram profile. */
  private def triHits(ws: Seq[String], as: String): Column =
    expr(s"str_count_any(norm, array(${ws.map(w => s"'$w'").mkString(", ")}))")
      .as(as)

  /** Language ID by character-trigram profile hits — the n-gram
    * heuristic variant of [[textLangid]]: occurrences of each
    * language's high-frequency trigrams in the document's char-3-gram
    * stream, argmax with the same fixed tie-break. The codegen'd
    * `str_count_any` counts pattern occurrences directly on the
    * normalized string — the trigram stream is never materialized,
    * let alone exploded or shuffled; distinct equal-width patterns
    * make occurrence counting identical to gram-set membership
    * counting (see [[graft.expressions.StrCountAny]]). */
  private def textLangidNgram(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"lang", normalizeText($"text").as("norm"))
      .filter(length($"norm") >= 3)
      .select($"doc_id", $"lang",
        triHits(EnTri, "en_hits"), triHits(DeTri, "de_hits"),
        triHits(FrTri, "fr_hits"), triHits(EsTri, "es_hits"))
      .select($"doc_id", $"lang",
        when($"en_hits" >= $"de_hits" && $"en_hits" >= $"fr_hits" &&
          $"en_hits" >= $"es_hits", "en")
          .when($"de_hits" >= $"fr_hits" && $"de_hits" >= $"es_hits", "de")
          .when($"fr_hits" >= $"es_hits", "fr")
          .otherwise("es").as("pred_lang"),
        $"en_hits", $"de_hits", $"fr_hits", $"es_hits")
      .orderBy($"doc_id")
  }

  /** Per-document top-3 terms by TF-IDF — the canonical corpus
    * weighting: tf = term count / doc length, idf = ln(N / df). Two
    * map-side-combined aggregations (per-(doc, term) counts, then
    * per-term doc frequencies), a shuffle join on the term (scale-safe
    * for unbounded vocabularies — no broadcast assumption), and a
    * per-doc top-k that plans as WindowGroupLimit. Scores are rounded
    * half-up to 6 dp BEFORE ranking so the rank comparison — and with
    * it the output — is identical in both engines; ties break on the
    * term. N counts docs with ≥1 token (mirroring unnest semantics)
    * and derives from the tf frame, so the corpus is scanned and
    * tokenized exactly once. The `ln` inputs (n/df) are exact IEEE
    * ratios of integers, identical in both engines; `ln` itself is the
    * one transcendental in the oracle surface, where a ≤1-ulp libm
    * divergence could in principle flip the 6th decimal on an exact
    * rounding boundary — probability ~1e-11 per value, and validated
    * empirically at sf0.01 and sf0.1. */
  private def textTfidf(s: SparkSession, d: String) = {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", size($"w").cast("long").as("len"),
        explode($"w").as("term"))
      .groupBy($"doc_id", $"len", $"term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct($"doc_id").as("n"))
    val scored = tf.join(df, "term").crossJoin(n)
      .select($"doc_id", $"term",
        roundHalfUp(($"tf".cast("double") / $"len") *
          log($"n".cast("double") / $"df"), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"doc_id", $"term", $"tfidf", $"rk".cast("long").as("rk"))
      .orderBy($"doc_id", $"rk")
  }

  private def tfidfOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS w FROM documents
       |),
       |base AS (
       |  SELECT doc_id, len(w) AS len, unnest(w) AS term
       |  FROM toks WHERE len(w) > 0
       |),
       |tf AS (
       |  SELECT doc_id, len, term, COUNT(*) AS tf FROM base GROUP BY 1, 2, 3
       |),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
       |scored AS (
       |  SELECT t.doc_id, t.term,
       |    ${roundHalfUpSql("(CAST(t.tf AS DOUBLE) / t.len) * ln(CAST(n.n AS DOUBLE) / df.df)", 6)} AS tfidf
       |  FROM tf t JOIN df ON t.term = df.term CROSS JOIN n
       |),
       |ranked AS (
       |  SELECT doc_id, term, tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, term ASC) AS rk
       |  FROM scored
       |)
       |SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  /** Deterministic hash sampling: keep ~10 % of documents by a
    * md5-derived bucket of the KEY (never `rand()` — reproducible on
    * any cluster, any partitioning, any rerun, and mirrored exactly by
    * the oracle). The standard curation primitive for subsetting a
    * corpus. */
  private def sampleHash(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(hash60(concat(lit("smp:"), $"doc_id".cast("string"))) % 100 < 10)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  /** Deterministic 90/5/5 train/val/test split by key hash — the
    * leakage-safe way to split: membership depends only on the key, so
    * adding data or re-partitioning never moves a document across
    * splits. */
  private def sampleSplit(s: SparkSession, d: String) = {
    import s.implicits._
    val bucket = hash60(concat(lit("split:"), $"doc_id".cast("string"))) % 100
    Tables.documents(s, d)
      .select($"doc_id",
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  // BPE merge training: rounds to unroll (each round = pick the top
  // pair, apply the merge corpus-wide, recount — the oracle mirrors
  // the same two rounds as chained CTEs).
  private val BpeRounds = 2

  /** (doc_id, pos, tok) → consecutive pairs (doc_id, pos, a, b). */
  private[graft] def bpePairs(toks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("b", lead(col("tok"), 1).over(w))
      .filter(col("b").isNotNull)
      .select(col("doc_id"), col("pos"), col("tok").as("a"), col("b"))
  }

  /** One BPE round's rewrite: merge every greedy-non-overlapping
    * occurrence of the (broadcast, 1-row) top pair. Occurrences are
    * selected left-to-right within runs by position parity (the
    * gaps-and-islands formulation — identical arithmetic in both
    * engines, no fold whose lambda semantics could diverge). */
  private[graft] def bpeMergeRound(toks: DataFrame, top: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = toks.crossJoin(broadcast(top.select(col("a"), col("b"))))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .withColumn("m", col("tok") === col("a") && col("nxt") === col("b"))
    val sel = marked.filter(col("m"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .withColumn("sel",
        (col("pos") - min(col("pos"))
          .over(Window.partitionBy(col("doc_id"), col("grp")))) % 2 === 0)
      .filter(col("sel")).select(col("doc_id"), col("pos"))
      .withColumn("s", lit(true))
    marked.join(sel, Seq("doc_id", "pos"), "left")
      .withColumn("s", coalesce(col("s"), lit(false)))
      .withColumn("sprev", lag(col("s"), 1, false).over(w))
      .filter(!col("sprev"))
      .select(col("doc_id"), col("pos"),
        when(col("s"), concat(col("tok"), lit(" "), col("nxt")))
          .otherwise(col("tok")).as("tok"))
  }

  /** Iterative BPE vocabulary training, [[BpeRounds]] rounds unrolled:
    * each round counts adjacent-symbol pairs corpus-wide, adopts the
    * most frequent pair (count desc, pair asc — deterministic) as a
    * merge, and REWRITES the corpus so the next round counts over the
    * merged symbols — the actual training loop `bpe_pair_stats` is one
    * iteration of. Output is the learned merge table. Per round: one
    * map-side-combined pair-count shuffle, a 1-row broadcast of the
    * winner, and one doc-keyed window pass for the rewrite — the shape
    * a distributed tokenizer trainer runs per merge at corpus scale
    * (production trains on a sampled subset; the loop is the same). */
  private def bpeTrainMerges(s: SparkSession, d: String) = {
    import s.implicits._
    bpeMerges(s, Tables.documents(s, d))
  }

  /** Adjacent-pair struct stream off the per-doc token ARRAYS — the
    * shuffle-free replacement for the exploded-stream `lead()` window:
    * pair identity stays (a, b) (a space-join would be ambiguous once
    * a merged symbol contains a space). */
  private def arrayPairs(arr: DataFrame): DataFrame = {
    import arr.sparkSession.implicits._
    arr.select(explode(expr(
        "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), " +
          "slice(w, 2, greatest(size(w) - 1, 0)), (x, y) -> struct(x, y))"))
        .as("p"))
      .select($"p.x".as("a"), $"p.y".as("b"))
  }

  /** [[bpeTrainMerges]] over an arbitrary (doc_id, text) frame (spec
    * hook — merges on a hand-computable corpus). Round 8: the
    * between-rounds corpus rewrite is the row-local codegen'd
    * `bpe_apply` (greedy non-overlap, proven ≡ the window rewrite by
    * `LmCurationSpec`), so each round costs one map-side-combined
    * pair-count shuffle + a 1-row broadcast — the doc-keyed window
    * passes are gone. */
  private[graft] def bpeMerges(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    var arr = docs.select($"doc_id", tokens($"text").as("w"))
    var out: DataFrame = null
    for (r <- 1 to BpeRounds) {
      val top = arrayPairs(arr).groupBy($"a", $"b")
        .agg(count(lit(1)).as("occurrences"))
        .orderBy($"occurrences".desc, $"a".asc, $"b".asc).limit(1)
      val row = top.select(lit(r.toLong).as("round"),
        concat($"a", lit(" "), $"b").as("pair"), $"occurrences")
      out = if (out == null) row else out.unionByName(row)
      if (r < BpeRounds)
        arr = arr.crossJoin(broadcast(top.select(
            concat($"a", lit(""), $"b").as("mg"))))
          .select($"doc_id", expr("bpe_apply(w, array(mg))").as("w"))
    }
    out.orderBy($"round")
  }

  /** Tokenizer application — the other half of the BPE loop: train the
    * [[BpeRounds]]-merge vocabulary exactly as `bpe_train_merges`
    * does, then REWRITE the whole corpus through every learned merge
    * (training rewrites through rounds-1; encoding applies them all)
    * and emit each document's raw vs encoded token count — the
    * compression a tokenizer buys. Self-contained like every catalog
    * op, so training cost is re-paid here; a production pipeline
    * trains once and broadcasts the merge table to encode-only runs
    * (the rewrite pass below IS that encode path: per round, a 1-row
    * broadcast of the merge and one doc-keyed window pass). */
  private def bpeEncode(s: SparkSession, d: String) =
    bpeEncodeOf(s, Tables.documents(s, d))

  /** The ordered merge frame `(round, mg)` the encode-from-store path
    * PERSISTS — mg in the `ab` form `bpe_apply` consumes, NOT
    * the display form "a b": a merged symbol contains spaces, so from
    * round 2 on the space-joined pair is ambiguous and the store must
    * keep the -delimited form. Training is the same loop as
    * [[bpeMerges]]. */
  private[graft] def bpeMergeStore(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    var arr = docs.select($"doc_id", tokens($"text").as("w"))
    var out: DataFrame = null
    for (r <- 1 to BpeRounds) {
      val top = arrayPairs(arr).groupBy($"a", $"b")
        .agg(count(lit(1)).as("occurrences"))
        .orderBy($"occurrences".desc, $"a".asc, $"b".asc).limit(1)
      val mg = top.select(concat($"a", lit(""), $"b").as("mg"))
      val row = top.select(lit(r.toLong).as("round"),
        concat($"a", lit(""), $"b").as("mg"))
      out = if (out == null) row else out.unionByName(row)
      if (r < BpeRounds)
        arr = arr.crossJoin(broadcast(mg))
          .select($"doc_id", expr("bpe_apply(w, array(mg))").as("w"))
    }
    out
  }

  /** Encode the corpus from a PERSISTED merge store — the half of the
    * BPE loop a production pipeline actually runs daily (`bpe_encode`
    * re-trains its merges in-query every call, which at 100 TB means
    * [[BpeRounds]] full pair-count shuffles per run): the ordered
    * merge list packs into ONE broadcast row and `bpe_apply` rewrites
    * every document in a single row-local pass — the encode plan has
    * NO shuffle at all before the output sort (LmCurationSpec pins
    * zero hash exchanges). Applying the full rank-ordered list in one
    * `bpe_apply` call is sequential-merge-equivalent by the
    * expression's own semantics (one full greedy pass per merge, rank
    * order), so the output — and the oracle — are exactly
    * `bpe_encode`'s. In this catalog entry the store derives in-query
    * (the `dedup_incremental` stand-in convention); the spec proves
    * the parquet round-trip path row-identical. */
  private def bpeEncodeFromStore(s: SparkSession, d: String) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    bpeEncodeFromMerges(s, docs, bpeMergeStore(s, docs))
  }

  /** BPE DECODE round-trip — the training-serving-skew gate the
    * encode-only ops cannot provide: encode the corpus through the
    * trained merge store, DECODE it back (every merged symbol is its
    * member words joined by the store's  delimiter, so decoding
    * is one row-local `translate` to spaces), and prove per document
    * that decode(encode(x)) equals the normalized token stream x —
    * the invertibility a tokenizer deployment asserts before shipping
    * a vocab (a merge table that drops or reorders content corrupts
    * EVERY downstream token id, silently). The oracle re-derives the
    * decoded text from ITS OWN merge chain, so the cross-engine hash
    * gate on `decoded_digest` proves both engines reconstruct the
    * identical byte stream, not just matching booleans.
    *
    * Scale: training is `bpe_train_merges`' pair-count folds; encode +
    * decode + digest are one row-local pass over the docs with the
    * merge list on a 1-row broadcast — no shuffle beyond the output
    * sort. */
  private def bpeDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val docs = Tables.documents(s, d)
    val packed = bpeMergeStore(s, docs)
      .agg(expr("transform(array_sort(collect_list(struct(round, mg)))," +
        " x -> x.mg)").as("mgs"))
    docs.select($"doc_id", tokens($"text").as("w"))
      .crossJoin(broadcast(packed))
      .withColumn("enc", expr("bpe_apply(w, mgs)"))
      .withColumn("decoded",
        translate(array_join($"enc", " "), "", " "))
      .select($"doc_id",
        size($"w").cast("long").as("n_tokens_raw"),
        size($"enc").cast("long").as("n_tokens_enc"),
        md5($"decoded").as("decoded_digest"),
        (md5($"decoded") === md5(array_join($"w", " ")))
          .as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  private def bpeDecodeOracle: String = {
    val rounds = (1 to BpeRounds)
      .map(r => bpeRoundSql(r, last = false)).mkString(",\n")
    s"""WITH toks1 AS (
       |  SELECT doc_id, CAST(s.pos AS BIGINT) - 1 AS pos, s.tok FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'tok': w[CAST(i AS INT)]}
       |              for i in range(1, len(w) + 1)]) AS s
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents))
       |),
       |$rounds,
       |dec AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens_enc,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS dd
       |  FROM toks${BpeRounds + 1} GROUP BY doc_id
       |),
       |raw AS (
       |  SELECT doc_id,
       |    CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens_raw,
       |    md5(array_to_string(${tokensSql("text")}, ' ')) AS rawd
       |  FROM documents
       |)
       |SELECT r.doc_id, r.n_tokens_raw,
       |  CAST(COALESCE(d.n_tokens_enc, 0) AS BIGINT) AS n_tokens_enc,
       |  COALESCE(d.dd, md5('')) AS decoded_digest,
       |  COALESCE(d.dd, md5('')) = r.rawd AS roundtrip_ok
       |FROM raw r LEFT JOIN dec d ON d.doc_id = r.doc_id
       |ORDER BY r.doc_id""".stripMargin
  }

  /** The encode pass alone, from any (round, mg) merge frame. */
  private[graft] def bpeEncodeFromMerges(s: SparkSession, docs: DataFrame,
                                         merges: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val packed = merges
      .agg(expr("transform(array_sort(collect_list(struct(round, mg))), x -> x.mg)")
        .as("mgs"))
    docs.select($"doc_id", tokens($"text").as("w"))
      .crossJoin(broadcast(packed))
      .select($"doc_id",
        size($"w").cast("long").as("n_tokens_raw"),
        size(expr("bpe_apply(w, mgs)")).cast("long").as("n_tokens_enc"))
      .withColumn("compression",
        roundHalfUp(lit(1.0) * $"n_tokens_enc" / $"n_tokens_raw", 6))
      .orderBy($"doc_id")
  }

  /** [[bpeEncode]] over an arbitrary (doc_id, text) frame (spec hook —
    * encode a hand-computable corpus). The encode pass itself — apply
    * every learned merge — is entirely row-local (`bpe_apply` over the
    * per-doc token array with the broadcast merge list); the only
    * shuffles are training's pair counts. */
  private[graft] def bpeEncodeOf(s: SparkSession, docs: DataFrame) = {
    import s.implicits._
    GraftFunctions.ensure(s)
    var arr = docs.select($"doc_id", tokens($"text").as("w"))
    for (_ <- 1 to BpeRounds) {
      val top = arrayPairs(arr).groupBy($"a", $"b")
        .agg(count(lit(1)).as("occurrences"))
        .orderBy($"occurrences".desc, $"a".asc, $"b".asc).limit(1)
      arr = arr.crossJoin(broadcast(top.select(
          concat($"a", lit(""), $"b").as("mg"))))
        .select($"doc_id", expr("bpe_apply(w, array(mg))").as("w"))
    }
    docs.select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens_raw"))
      .join(arr.select($"doc_id", size($"w").cast("long").as("n_tokens_enc")),
        Seq("doc_id"))
      .select($"doc_id", $"n_tokens_raw", $"n_tokens_enc",
        roundHalfUp(lit(1.0) * $"n_tokens_enc" / $"n_tokens_raw", 6)
          .as("compression"))
      .orderBy($"doc_id")
  }

  private def bpeEncodeOracle: String = {
    val rounds = (1 to BpeRounds)
      .map(r => bpeRoundSql(r, last = false)).mkString(",\n")
    s"""WITH toks1 AS (
       |  SELECT doc_id, CAST(s.pos AS BIGINT) - 1 AS pos, s.tok FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'tok': w[CAST(i AS INT)]}
       |              for i in range(1, len(w) + 1)]) AS s
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents))
       |),
       |$rounds,
       |enc AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens_enc
       |  FROM toks${BpeRounds + 1} GROUP BY doc_id
       |),
       |raw AS (
       |  SELECT doc_id, CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens_raw
       |  FROM documents
       |)
       |SELECT r.doc_id, r.n_tokens_raw, e.n_tokens_enc,
       |  CAST(FLOOR((1.0 * e.n_tokens_enc / r.n_tokens_raw) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS compression
       |FROM raw r JOIN enc e ON r.doc_id = e.doc_id
       |ORDER BY r.doc_id""".stripMargin
  }

  /** One BPE round's CTE chain for the oracle: toks$r → top$r (+ the
    * rewrite into toks${r+1} unless it is the last round). */
  private def bpeRoundSql(r: Int, last: Boolean): String = {
    val base =
      s"""pairs$r AS (
         |  SELECT a, b, COUNT(*) AS occurrences FROM (
         |    SELECT doc_id, pos, tok AS a,
         |      LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
         |    FROM toks$r)
         |  WHERE b IS NOT NULL GROUP BY a, b
         |),
         |top$r AS (
         |  SELECT a, b, occurrences FROM pairs$r
         |  ORDER BY occurrences DESC, a ASC, b ASC LIMIT 1
         |)""".stripMargin
    if (last) base else base + s""",
         |marked$r AS (
         |  SELECT t.doc_id, t.pos, t.tok,
         |    LEAD(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS nxt,
         |    (t.tok = p.a AND
         |     LEAD(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) = p.b) AS m
         |  FROM toks$r t CROSS JOIN top$r p
         |),
         |sel$r AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      (pos - MIN(pos) OVER (PARTITION BY doc_id, grp)) % 2 = 0 AS sel
         |    FROM (
         |      SELECT doc_id, pos,
         |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |      FROM marked$r WHERE m))
         |  WHERE sel
         |),
         |toks${r + 1} AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN s THEN tok || ' ' || nxt ELSE tok END AS tok
         |  FROM (
         |    SELECT mk.doc_id, mk.pos, mk.tok, mk.nxt,
         |      sl.pos IS NOT NULL AS s,
         |      LAG(sl.pos IS NOT NULL, 1, false)
         |        OVER (PARTITION BY mk.doc_id ORDER BY mk.pos) AS sprev
         |    FROM marked$r mk
         |    LEFT JOIN sel$r sl ON mk.doc_id = sl.doc_id AND mk.pos = sl.pos)
         |  WHERE NOT sprev
         |)""".stripMargin
  }

  private def bpeMergesOracle: String = {
    val rounds = (1 to BpeRounds)
      .map(r => bpeRoundSql(r, last = r == BpeRounds)).mkString(",\n")
    val out = (1 to BpeRounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, a || ' ' || b AS pair, " +
        s"occurrences FROM top$r")
      .mkString("\nUNION ALL\n")
    s"""WITH toks1 AS (
       |  SELECT doc_id, CAST(s.pos AS BIGINT) - 1 AS pos, s.tok FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'tok': w[CAST(i AS INT)]}
       |              for i in range(1, len(w) + 1)]) AS s
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents))
       |),
       |$rounds
       |$out
       |ORDER BY round""".stripMargin
  }

  // Unigram-LM quality scoring (the CCNet shape): vocabulary cap and
  // add-one smoothing constant. The capped vocab is what makes the
  // scorer scale — the model is top-[[LmVocab]] (term, count) rows, a
  // broadcast table at ANY corpus size; everything off-vocab shares
  // the one smoothed OOV probability.
  private val LmVocab = 2048

  /** Per-document cross-entropy / perplexity under an add-one-smoothed
    * unigram LM trained on the corpus itself — the CCNet-style quality
    * signal (a Wikipedia-trained LM scores web text in production; the
    * corpus-trained twin keeps the op self-contained). Two shuffles
    * total at any scale: one term-keyed count (map-side combined) to
    * train, one doc-keyed combine to score; the trained model joins
    * broadcast, so the scoring pass is scan + broadcast-join + partial
    * agg. Per-token log-probs are quantized to 9 decimals and summed
    * in DECIMAL so combine order cannot perturb the score. */
  private def textLmScore(s: SparkSession, d: String) =
    lmScore(s, Tables.documents(s, d))

  /** [[textLmScore]] over an arbitrary (doc_id, text) frame (spec hook —
    * testdata's 31-term vocabulary never exceeds [[LmVocab]], so the
    * OOV path is pinned on a synthetic corpus). */
  private[graft] def lmScore(s: SparkSession, docs: DataFrame) = {
    import s.implicits._
    val inst = docs
      .select($"doc_id", explode(tokens($"text")).as("term"))
    val counts = inst.groupBy($"term").agg(count(lit(1)).as("c"))
    val n = counts.agg(sum($"c").cast("double").as("n"))
    val vocab = counts.orderBy($"c".desc, $"term".asc).limit(LmVocab)
    inst
      .join(broadcast(vocab), Seq("term"), "left")
      .crossJoin(broadcast(n))
      .withColumn("logp", roundHalfUp(
        log((coalesce($"c", lit(0L)) + 1).cast("double") /
          ($"n" + lit(LmVocab + 1))), 9))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countWhen($"c".isNull).as("n_oov"),
        sum($"logp".cast("decimal(27,18)")).as("slp"))
      .select($"doc_id", $"n_tokens", $"n_oov",
        roundHalfUp(-($"slp".cast("double")) / $"n_tokens", 6)
          .as("cross_entropy"))
      .withColumn("ppl", roundHalfUp(exp($"cross_entropy"), 4))
      .orderBy($"doc_id")
  }

  private[graft] def lmScoreOracle: String =
    s"""WITH inst AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |),
       |counts AS (SELECT term, COUNT(*) AS c FROM inst GROUP BY term),
       |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM counts),
       |vocab AS (SELECT term, c FROM counts ORDER BY c DESC, term ASC LIMIT $LmVocab),
       |scored AS (
       |  SELECT i.doc_id, v.c IS NULL AS oov,
       |    ${roundHalfUpSql(
              s"ln((COALESCE(v.c, 0) + 1.0) / (t.n + ${LmVocab + 1}))", 9)} AS logp
       |  FROM inst i LEFT JOIN vocab v ON i.term = v.term CROSS JOIN tot t
       |),
       |agged AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    ${roundHalfUpSql(
              "-CAST(SUM(CAST(logp AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)",
              6)} AS cross_entropy
       |  FROM scored GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens, n_oov, cross_entropy,
       |  ${roundHalfUpSql("exp(cross_entropy)", 4)} AS ppl
       |FROM agged
       |ORDER BY doc_id""".stripMargin

  // Bigram-LM scorer: bigram table cap and the Stupid Backoff weight.
  // Like the unigram vocab cap, the pair cap is what makes the model a
  // fixed-size BROADCAST table at any corpus size — the Brants et al.
  // "Large Language Models in Machine Translation" recipe: keep the
  // frequent n-grams exactly, back off everything else with a constant
  // penalty (0.4) to the lower order.
  private val BigramTab = 4096

  /** Per-document cross-entropy under a BIGRAM LM with Stupid Backoff —
    * the order-2 upgrade of [[textLmScore]] that catches word-salad
    * documents whose unigram distribution looks fine (shuffled text has
    * identical unigram CE but collapses under a bigram model).
    *
    * Model = two capped broadcast tables trained in one pass each:
    * the top-[[BigramTab]] (prev, cur) pairs carrying their exact pair
    * AND context counts, and the [[LmVocab]]-capped unigram vocab.
    * Scoring: a seen pair gets add-one conditional
    * `ln((c_ab+1)/(c_a+V+1))`; an unseen pair backs off to
    * `ln(0.4 · p_uni(cur))`; a document's first token scores
    * `ln(p_uni)` directly. Bigram instances are built ROW-LOCAL from
    * the token array (adjacent zip — no posexplode, no position
    * window), so the only shuffles are the two training counts and the
    * doc-keyed combine; both model joins are broadcast. Per-instance
    * log-probs quantize to 9 decimals and sum as DECIMAL — combine
    * order cannot perturb a score. */
  private def textLmBigram(s: SparkSession, d: String) =
    lmBigram(s, Tables.documents(s, d))

  /** [[textLmBigram]] over an arbitrary (doc_id, text) frame (spec
    * hook — pins the backoff and first-token paths on a corpus where
    * specific pairs are absent). */
  private[graft] def lmBigram(s: SparkSession, docs: DataFrame) = {
    import s.implicits._
    val inst = docs
      .select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(w) < 1 THEN array()
          |ELSE transform(sequence(1, size(w)), i -> named_struct(
          |  'a', IF(i = 1, CAST(NULL AS STRING), element_at(w, i - 1)),
          |  'b', element_at(w, i))) END""".stripMargin)).as("p"))
      .select($"doc_id", $"p.a", $"p.b")
    val uni = inst.groupBy($"b".as("term")).agg(count(lit(1)).as("c"))
    val n = uni.agg(sum($"c").cast("double").as("n"))
    val vocab = uni.orderBy($"c".desc, $"term".asc).limit(LmVocab)
    val pairs = inst.filter($"a".isNotNull)
      .groupBy($"a", $"b").agg(count(lit(1)).as("c_ab"))
      .join(uni.select($"term".as("a"), $"c".as("c_a")), Seq("a"))
      .orderBy($"c_ab".desc, $"a".asc, $"b".asc).limit(BigramTab)
    inst
      .join(broadcast(pairs), Seq("a", "b"), "left")
      .join(broadcast(vocab.select($"term".as("b"), $"c".as("c_b"))),
        Seq("b"), "left")
      .crossJoin(broadcast(n))
      .withColumn("p_uni",
        (coalesce($"c_b", lit(0L)) + 1).cast("double") / ($"n" + lit(LmVocab + 1)))
      .withColumn("logp", roundHalfUp(
        when($"a".isNull, log($"p_uni"))
          .when($"c_ab".isNotNull,
            log(($"c_ab" + 1).cast("double") / ($"c_a" + lit(LmVocab + 1))))
          .otherwise(log(lit(0.4) * $"p_uni")), 9))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        countWhen($"a".isNotNull && $"c_ab".isNull).as("n_backoff"),
        sum($"logp".cast("decimal(27,18)")).as("slp"))
      .select($"doc_id", $"n_tokens", $"n_backoff",
        roundHalfUp(-($"slp".cast("double")) / $"n_tokens", 6)
          .as("cross_entropy"))
      .withColumn("ppl", roundHalfUp(exp($"cross_entropy"), 4))
      .orderBy($"doc_id")
  }

  private def lmBigramOracle: String =
    s"""WITH inst AS (
       |  SELECT doc_id, s.a, s.b FROM (
       |    SELECT doc_id,
       |      unnest([{'a': CASE WHEN i = 1 THEN NULL ELSE w[CAST(i AS INT) - 1] END,
       |               'b': w[CAST(i AS INT)]}
       |              for i in range(1, len(w) + 1)]) AS s
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS w FROM documents))
       |),
       |uni AS (SELECT b AS term, COUNT(*) AS c FROM inst GROUP BY b),
       |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
       |vocab AS (SELECT term, c FROM uni ORDER BY c DESC, term ASC LIMIT $LmVocab),
       |pairs AS (
       |  SELECT p.a, p.b, p.c_ab, u.c AS c_a FROM (
       |    SELECT a, b, COUNT(*) AS c_ab FROM inst WHERE a IS NOT NULL
       |    GROUP BY a, b) p
       |  JOIN uni u ON u.term = p.a
       |  ORDER BY p.c_ab DESC, p.a ASC, p.b ASC LIMIT $BigramTab
       |),
       |scored AS (
       |  SELECT i.doc_id, i.a IS NOT NULL AND pr.c_ab IS NULL AS backoff,
       |    ${roundHalfUpSql(
              s"""CASE
                 |      WHEN i.a IS NULL
                 |        THEN ln((COALESCE(v.c, 0) + 1.0) / (t.n + ${LmVocab + 1}))
                 |      WHEN pr.c_ab IS NOT NULL
                 |        THEN ln((pr.c_ab + 1.0) / (pr.c_a + ${LmVocab + 1}))
                 |      ELSE ln(0.4 * (COALESCE(v.c, 0) + 1.0) / (t.n + ${LmVocab + 1}))
                 |    END""".stripMargin, 9)} AS logp
       |  FROM inst i
       |  LEFT JOIN pairs pr ON i.a = pr.a AND i.b = pr.b
       |  LEFT JOIN vocab v ON i.b = v.term
       |  CROSS JOIN tot t
       |),
       |agged AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
       |    ${roundHalfUpSql(
            "-CAST(SUM(CAST(logp AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)",
            6)} AS cross_entropy
       |  FROM agged_src GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens, n_backoff, cross_entropy,
       |  ${roundHalfUpSql("exp(cross_entropy)", 4)} AS ppl
       |FROM agged
       |ORDER BY doc_id""".stripMargin
      .replace("FROM agged_src", "FROM scored")

  // Cross-document duplicate-span coverage: span width in tokens. 8
  // whitespace tokens ≈ the 50-character windows the ExactSubstr line
  // of work deduplicates on.
  private val SpanK = 8

  /** Fraction of each document covered by [[SpanK]]-token spans that
    * also appear verbatim in ANOTHER document — the fixed-width
    * distributed form of exact-substring dedup (a suffix array does
    * not shard; hashed fixed-width spans do, and are the standard
    * MapReduce approximation). Spans are built row-local by the
    * codegen'd shingle expression and leave the row only as 60-bit
    * hashes; one shuffle on the span hash finds cross-doc spans, one
    * doc-keyed combine scores. Distinct from `text_repetition`
    * (WITHIN-doc dup-grams) — this is the BETWEEN-doc signal. */
  private def textDupSpans(s: SparkSession, d: String) =
    dupSpans(s, Tables.documents(s, d))

  /** [[textDupSpans]] over an arbitrary (doc_id, text) frame (spec hook). */
  private[graft] def dupSpans(s: SparkSession, docs: DataFrame) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val spans = docs
      .select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", explode(wordShingles("w", SpanK)).as("span"))
      .select($"doc_id", hash60(concat(lit("ss:"), $"span")).as("h"))
    val dup = spans.groupBy($"h")
      .agg(count_distinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
    spans.join(dup, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        countWhen($"nd".isNotNull).as("n_dup_spans"))
      .select($"doc_id", $"n_spans", $"n_dup_spans",
        roundHalfUp(lit(1.0) * $"n_dup_spans" / $"n_spans", 6).as("dup_frac"))
      .orderBy($"doc_id")
  }

  private def dupSpansOracle: String =
    s"""WITH spans AS (
       |  SELECT doc_id, ${hash60Sql("'ss:' || span")} AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest([array_to_string(words[i:i+${SpanK - 1}], ' ')
       |              for i in range(1, len(words) - ${SpanK - 2})]) AS span
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS words FROM documents)
       |    WHERE len(words) >= $SpanK)
       |),
       |dup AS (
       |  SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
       |)
       |SELECT s.doc_id, COUNT(*) AS n_spans,
       |  CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_spans,
       |  ${roundHalfUpSql(
            "1.0 * SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*)",
            6)} AS dup_frac
       |FROM spans s LEFT JOIN dup d ON s.h = d.h
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** Packs (doc_id, position) into one BIGINT so "global first
    * occurrence" is a plain MIN — valid while positions stay below
    * 2²⁰ tokens/doc and doc ids below 2⁴³ (both generous at 100 TB;
    * the pack constant is the documented bound, not a magic number). */
  private val ExPosW = 1048576L

  /** Maximal-span EXCISION — the acting half of the ExactSubstr dedup
    * recipe (Lee et al., arXiv:2107.06499) whose measuring half is
    * `text_dup_spans`: that op scores how much of each doc is
    * cross-doc duplicated; this one emits the concrete token intervals
    * a rewrite job removes. Same [[SpanK]]-token hashed spans (built
    * row-local, shuffled only as 60-bit hashes); a span occurrence is
    * excisable when the span appears in ≥ 2 DISTINCT docs and the
    * occurrence is not the corpus-wide FIRST (min packed
    * (doc_id, pos) — the keep-one-copy rule, so every duplicated span
    * provably survives somewhere); per doc, excisable K-token
    * intervals merge into maximal spans via gaps-and-islands (running
    * max of interval ends over a doc-keyed window — never global).
    * Output: one row per maximal span, 1-based inclusive token
    * interval — the removal manifest.
    *
    * Honest caveats, same as the production implementations: the
    * keep-one guarantee is per-GRAM (an overlapping DIFFERENT gram's
    * span may still clip tokens of a kept occurrence), and within-doc
    * self-repetition alone never excises (cross-doc only —
    * within-doc is `text_repetition`'s signal).
    *
    * Scale: one shuffle on span hash (map-side-combined agg to
    * (nd, first-key) per gram), one hash join back, one doc-keyed
    * window chain — the suffix array this approximates does not
    * shard; this does. */
  private def textSpanExcise(s: SparkSession, d: String) =
    spanExcise(s, Tables.documents(s, d))

  /** [[textSpanExcise]] over an arbitrary (doc_id, text) frame. */
  private[graft] def spanExcise(s: SparkSession, docs: DataFrame) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val occ = docs
      .select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", posexplode(wordShingles("w", SpanK)))
      .select($"doc_id", ($"pos" + 1).cast("long").as("p"),
        hash60(concat(lit("ss:"), $"col")).as("h"))
    // two-level fold instead of count_distinct+min in one agg: the
    // mixed distinct/plain form plans an Expand (2x rows through the
    // shuffle); (h, doc) then (h) keeps both stages map-side combined
    val first = occ
      .groupBy($"h", $"doc_id")
      .agg(min($"doc_id" * ExPosW + $"p").as("k"))
      .groupBy($"h")
      .agg(count(lit(1)).as("nd"), min($"k").as("fk"))
      .filter($"nd" >= 2)
    val excise = occ.join(first, "h")
      .filter($"doc_id" * ExPosW + $"p" =!= $"fk")
      .select($"doc_id", $"p")
    val wPrev = Window.partitionBy($"doc_id").orderBy($"p".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy($"doc_id").orderBy($"p".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    excise
      .withColumn("pe", max($"p" + lit(SpanK - 1)).over(wPrev))
      .withColumn("brk",
        when($"pe".isNull || $"p" > $"pe" + 1, 1L).otherwise(0L))
      .withColumn("island", sum($"brk").over(wRun))
      .groupBy($"doc_id", $"island")
      .agg(min($"p").as("span_start"),
        (max($"p") + lit(SpanK - 1).cast("long")).as("span_end"))
      .select($"doc_id", $"span_start", $"span_end",
        ($"span_end" - $"span_start" + 1L).as("span_tokens"))
      .orderBy($"doc_id", $"span_start")
  }

  /** The excise chain (toks…grp) as a reusable CTE body — shared by
    * the manifest oracle and the rewrite oracle that applies it. */
  private def spanExciseCtes: String =
    s"""toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS words FROM documents
       |),
       |pos AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(words) - ${SpanK - 2})) AS p, words
       |  FROM toks WHERE len(words) >= $SpanK
       |),
       |occ AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS p,
       |    ${hash60Sql(
              s"'ss:' || array_to_string(words[p:p+${SpanK - 1}], ' ')")} AS h
       |  FROM pos
       |),
       |first AS (
       |  SELECT h, MIN(doc_id * $ExPosW + p) AS fk
       |  FROM occ GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
       |),
       |ex AS (
       |  SELECT o.doc_id, o.p FROM occ o JOIN first f ON o.h = f.h
       |  WHERE o.doc_id * $ExPosW + o.p <> f.fk
       |),
       |isl AS (
       |  SELECT doc_id, p,
       |    MAX(p + ${SpanK - 1}) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
       |  FROM ex
       |),
       |grp AS (
       |  SELECT doc_id, p,
       |    SUM(CASE WHEN pe IS NULL OR p > pe + 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl
       |)""".stripMargin

  private def spanExciseOracle: String =
    s"""WITH $spanExciseCtes
       |SELECT doc_id, MIN(p) AS span_start,
       |  MAX(p) + ${SpanK - 1} AS span_end,
       |  MAX(p) + ${SpanK - 1} - MIN(p) + 1 AS span_tokens
       |FROM grp GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  /** Rewrite executor for the excision manifest — the acting half's
    * acting half: [[spanExcise]] names the token intervals a dedup
    * rewrite removes, this op APPLIES them. Each doc's removed
    * positions expand from the manifest (span intervals → one row per
    * removed token — bounded by removal volume, never doc volume),
    * surviving tokens anti-join away the removals and reassemble in
    * position order (the `text_boilerplate` reassembly shape), and
    * the op emits the per-doc accounting (tokens before/removed/
    * after) plus the md5 digest of the cleaned text — the columns a
    * rewrite job checkpoints so a re-run can prove it produced the
    * identical corpus. Docs the manifest never touches keep all
    * tokens (digest = their token-joined text); a fully-excised doc
    * survives as an accounting row with the empty digest.
    *
    * Scale: the manifest derivation is `text_span_excise`'s own cost;
    * applying it adds one doc-keyed anti-join sized by the removal
    * volume and one doc-keyed ordered reassembly — no global sort, no
    * text shuffle beyond each doc's own tokens. */
  private def textSpanRewrite(s: SparkSession, d: String) = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val docs = Tables.documents(s, d)
    val spans = spanExcise(s, docs)
    val toks = docs.select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") >= 1)
      .select($"doc_id", size($"w").cast("long").as("n_before"),
        posexplode($"w"))
      .select($"doc_id", $"n_before", ($"pos" + 1).cast("long").as("p"),
        $"col".as("tok"))
    val removed = spans.select($"doc_id",
      explode(sequence($"span_start", $"span_end")).as("p"))
    val agg = toks.join(removed, Seq("doc_id", "p"), "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_after"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"p", $"tok"))),
          x => x.getField("tok")), " ")).as("clean_digest"))
    docs.select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") >= 1)
      .select($"doc_id", size($"w").cast("long").as("n_before"))
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id", $"n_before",
        ($"n_before" - coalesce($"n_after", lit(0L))).as("n_removed"),
        coalesce($"n_after", lit(0L)).as("n_after"),
        coalesce($"clean_digest", md5(lit(""))).as("clean_digest"))
      .orderBy($"doc_id")
  }

  private def spanRewriteOracle: String =
    s"""WITH $spanExciseCtes,
       |spans AS (
       |  SELECT doc_id, MIN(p) AS span_start, MAX(p) + ${SpanK - 1} AS span_end
       |  FROM grp GROUP BY doc_id, island
       |),
       |rem AS (
       |  SELECT doc_id, unnest(range(span_start, span_end + 1)) AS p
       |  FROM spans
       |),
       |tk AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_before,
       |    CAST(unnest(range(1, len(words) + 1)) AS BIGINT) AS p, words
       |  FROM toks WHERE len(words) >= 1
       |),
       |kept AS (
       |  SELECT t.doc_id, t.p, t.words[t.p] AS tok
       |  FROM tk t LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.p = t.p
       |  WHERE r.p IS NULL
       |),
       |ag AS (
       |  SELECT doc_id, COUNT(*) AS n_after,
       |    md5(string_agg(tok, ' ' ORDER BY p)) AS clean_digest
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT b.doc_id, b.n_before,
       |  b.n_before - COALESCE(a.n_after, 0) AS n_removed,
       |  COALESCE(a.n_after, 0) AS n_after,
       |  COALESCE(a.clean_digest, md5('')) AS clean_digest
       |FROM (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_before
       |      FROM toks WHERE len(words) >= 1) b
       |LEFT JOIN ag a ON a.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  /** BM25 query terms — drawn from the corpus vocabulary. */
  private val BmQuery = Seq("hash", "join", "scan")

  /** Okapi BM25 ranking of the corpus against a fixed term query —
    * the lexical-retrieval scorer (k1 = 1.2, b = 0.75, Lucene idf
    * `ln(1 + (N - df + ½)/(df + ½))`): what a retrieval-augmented
    * pipeline runs to mine training documents for a topic.
    *
    * Scale: the scan filters to query terms BEFORE the tf aggregate,
    * so only matching (doc, term) rows — at most |query| per doc —
    * ever shuffle; df and the (N, Σdl) stats are tiny aggregates
    * broadcast back; the final top-k is a TakeOrdered, never a full
    * sort. Cross-engine determinism: per-term scores quantize to 9 dp
    * and sum as exact DECIMAL(27,12); every constant is written as
    * the same literal in both engines so the double math is
    * bit-identical. */
  private[ops] def rankBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", size($"w").cast("long").as("dl"),
        explode($"w").as("term"))
    val stats = base.select($"doc_id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")) // 1 row
    val tf = base.filter($"term".isin(BmQuery: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val sc = roundHalfUp(
      log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
        ($"tf" * lit(2.2)) /
        ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" /
          ($"sum_dl".cast("double") / $"n_docs"))), 9)
    tf.join(broadcast(df), "term").crossJoin(broadcast(stats))
      .select($"doc_id", sc.as("sc"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"),
        roundHalfUp(sum($"sc".cast(
          org.apache.spark.sql.types.DecimalType(27, 12))).cast("double"), 6)
          .as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(20)
  }

  /** The BM25 oracle's CTE chain (no leading `WITH`) and final SELECT,
    * exposed separately so composers ([[Similarity]]'s hybrid rerank)
    * can splice the chain into a bigger WITH and wrap the final SELECT
    * as their own CTE — named-part composition instead of string
    * surgery on the assembled statement, so reformatting here can
    * never silently break the downstream oracle. */
  private[ops] def bm25Ctes: String = {
    val inList = BmQuery.map(t => s"'$t'").mkString(", ")
    val scExpr = roundHalfUpSql(
      "ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (t.tf * 2.2) / " +
        "(t.tf + 1.2 * (0.25 + 0.75 * t.dl / " +
        "(CAST(s.sum_dl AS DOUBLE) / s.n_docs)))", 9)
    s"""base AS (
       |  SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM (
       |    SELECT doc_id, ${tokensSql("text")} AS w FROM documents
       |  ) WHERE len(w) > 0
       |),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl
       |  FROM (SELECT DISTINCT doc_id, dl FROM base)
       |),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM base
       |  WHERE term IN ($inList) GROUP BY doc_id, dl, term
       |),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT t.doc_id, $scExpr AS sc
       |  FROM tf t JOIN df ON t.term = df.term CROSS JOIN stats s
       |)""".stripMargin
  }

  private[ops] def bm25FinalSelect: String =
    s"""SELECT doc_id, COUNT(*) AS n_terms,
       |  ${roundHalfUpSql(
        "CAST(SUM(CAST(sc AS DECIMAL(27,12))) AS DOUBLE)", 6)} AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC
       |LIMIT 20""".stripMargin

  private[ops] def bm25Oracle: String =
    s"WITH $bm25Ctes\n$bm25FinalSelect"

  /** Second stored-index query — exists to make `rank_bm25_from_store`
    * demonstrate the point of persisting the index: one build serving
    * MULTIPLE retrievals. */
  private val BmQuery2 = Seq("sort", "merge", "stream")

  /** Build the persisted lexical index from a documents frame: full
    * postings (doc_id, dl, term, tf), per-term document frequency, and
    * the 1-row corpus stats — the parquet store a retrieval pipeline
    * keeps between queries ([[graft.ops.Dedup]]'s `signatureStore`
    * convention, lexical flavor). df and stats derive from POSTINGS
    * (not the raw text), because that is exactly what a store refresh
    * job can see; df is stored rather than re-derived per query so a
    * query never scans the full postings table for its three terms. */
  private[graft] def lexicalIndex(s: SparkSession, docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val postings = docs
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", size($"w").cast("long").as("dl"),
        explode($"w").as("term"))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val dfAll = postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = postings.select($"doc_id", $"dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl")) // 1 row
    (postings, dfAll, stats)
  }

  /** Score STORED postings against a (query_id, term) table without
    * touching the corpus text: postings filter to query terms via a
    * broadcast join (≤ |query| rows survive per doc), stored df and
    * stats ride along as broadcasts, top-10 per query by the same
    * 9 dp-quantized, DECIMAL-summed BM25 as [[rankBm25]]. */
  private[graft] def bm25FromStore(s: SparkSession, postings: DataFrame,
                                   dfAll: DataFrame, stats: DataFrame,
                                   queries: DataFrame): DataFrame = {
    import s.implicits._
    val sc = roundHalfUp(
      log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
        ($"tf" * lit(2.2)) /
        ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" /
          ($"sum_dl".cast("double") / $"n_docs"))), 9)
    val w = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"doc_id".asc)
    postings.join(broadcast(queries), "term")
      .join(broadcast(dfAll), "term")
      .crossJoin(broadcast(stats))
      .select($"query_id", $"doc_id", sc.as("sc"))
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_terms"),
        roundHalfUp(sum($"sc".cast(
          org.apache.spark.sql.types.DecimalType(27, 12))).cast("double"), 6)
          .as("score"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter($"rk" <= 10)
      .select($"query_id", $"rk", $"doc_id", $"n_terms", $"score")
  }

  /** BM25 from a PERSISTED lexical index — the retrieval twin of
    * `dedup_incremental`'s signature store: `rank_bm25` re-tokenizes
    * the corpus and retrains df/stats on EVERY call, which at 100 TB
    * means a full text scan per query; here the index (postings + df +
    * stats) is built once and two different term queries are answered
    * from it, the corpus text untouched by either. In this catalog
    * entry the index derives in-query so the oracle mirrors the whole
    * flow; the spec proves a parquet round-trip of all three store
    * frames is attach-identical and pins that the from-store plan
    * reads ONLY the store. */
  private def rankBm25FromStore(s: SparkSession, d: String) = {
    import s.implicits._
    val (postings, dfAll, stats) = lexicalIndex(s, Tables.documents(s, d))
    val queries = (BmQuery.map(("q1", _)) ++ BmQuery2.map(("q2", _)))
      .toDF("query_id", "term")
    bm25FromStore(s, postings, dfAll, stats, queries)
      .orderBy($"query_id", $"rk")
  }

  private def bm25FromStoreOracle: String =
    fromStoreOracleFor(BmQuery.map(("q1", _)) ++ BmQuery2.map(("q2", _)))

  /** The from-store retrieval oracle, parameterized by the query set —
    * shared by `rank_bm25_from_store` and `lexical_index_merge`
    * (the latter's merged index must equal a full rebuild EXACTLY, so
    * its oracle is the rebuild-side retrieval over the whole corpus). */
  private def fromStoreOracleFor(queries: Seq[(String, String)]): String = {
    val qvals = queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")
    val scExpr = roundHalfUpSql(
      "ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (p.tf * 2.2) / " +
        "(p.tf + 1.2 * (0.25 + 0.75 * p.dl / " +
        "(CAST(s.sum_dl AS DOUBLE) / s.n_docs)))", 9)
    s"""WITH postings AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM (
       |      SELECT doc_id, ${tokensSql("text")} AS w FROM documents
       |    ) WHERE len(w) > 0
       |  ) GROUP BY doc_id, dl, term
       |),
       |dfall AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl
       |  FROM (SELECT DISTINCT doc_id, dl FROM postings)
       |),
       |queries AS (SELECT * FROM (VALUES $qvals) t(query_id, term)),
       |scored AS (
       |  SELECT q.query_id, p.doc_id, $scExpr AS sc
       |  FROM postings p
       |  JOIN queries q ON p.term = q.term
       |  JOIN dfall df ON p.term = df.term
       |  CROSS JOIN stats s
       |),
       |agg AS (
       |  SELECT query_id, doc_id, COUNT(*) AS n_terms,
       |    ${roundHalfUpSql(
        "CAST(SUM(CAST(sc AS DECIMAL(27,12))) AS DOUBLE)", 6)} AS score
       |  FROM scored GROUP BY query_id, doc_id
       |),
       |ranked AS (
       |  SELECT query_id, doc_id, n_terms, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS INT) AS rk
       |  FROM agg
       |)
       |SELECT query_id, rk, doc_id, n_terms, score
       |FROM ranked WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin
  }

  /** Query set answered from the MERGED index — drawn from the same
    * corpus vocabulary but distinct from the q1/q2 build-time sets so
    * the merge gate exercises terms neither store query touched. */
  private val BmQueryM = Seq("filter", "window", "vector")

  /** Deterministic ~10 % ingest slice for the lexical store — its own
    * salt, so the lexical "today's batch" is independent of the dedup
    * signature store's slice (a real pipeline has an ingest column). */
  private[graft] def isLexBatch(docId: Column): Column =
    hash60(concat(lit("lex:"), docId.cast("string"))) % 10 === 0

  /** Merge an ingest increment into the persisted lexical index — the
    * store-refresh job [[lexicalIndex]]'s doc-comment promises: stored
    * postings union the increment's (doc sets are disjoint, so union
    * IS the merged postings table — at 100 TB an append, no rewrite);
    * per-term df merges by summation (one keyed shuffle of two
    * vocab-sized frames — millions of rows, never the corpus); the
    * 1-row corpus stats add component-wise. Exactness, not
    * approximation: every merged frame is value-identical to a full
    * rebuild over old ∪ new, which is what lets `lexical_index_merge`
    * face a rebuild-side oracle. */
  private[graft] def lexicalIndexMerge(
      storePostings: DataFrame, storeDf: DataFrame, storeStats: DataFrame,
      incPostings: DataFrame, incDf: DataFrame, incStats: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val postings = storePostings.unionByName(incPostings)
    val dfAll = storeDf.unionByName(incDf)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = storeStats.unionByName(incStats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    (postings, dfAll, stats)
  }

  /** Incremental lexical-index ingest — the retrieval twin of
    * `ann_ivf_incremental`: the existing corpus' index is the
    * persisted store, the deterministic [[isLexBatch]] slice is
    * today's crawl, and the increment is tokenized ALONE
    * ([[lexicalIndex]] over the new docs only), then merged into the
    * store by [[lexicalIndexMerge]] — old text is never re-read. The
    * merged index answers a fresh term query; because merge ≡ rebuild
    * exactly, the oracle is the full-corpus retrieval, so the gate
    * proves the merge math (postings append, df summation, stats add)
    * through final BM25 scores. LexicalIndexSpec additionally proves
    * frame-level merge ≡ rebuild equality and that the merge path's
    * store side comes from parquet, not the corpus. */
  private def lexicalIndexMergeOp(s: SparkSession, d: String) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val (sp, sdf, sst) = lexicalIndex(s, docs.filter(!isLexBatch($"doc_id")))
    val (ip, idf, ist) = lexicalIndex(s, docs.filter(isLexBatch($"doc_id")))
    val (p, f, st) = lexicalIndexMerge(sp, sdf, sst, ip, idf, ist)
    bm25FromStore(s, p, f, st, BmQueryM.map(("m1", _)).toDF("query_id", "term"))
      .orderBy($"query_id", $"rk")
  }

  // ---------------------------------------------------------------
  // Unigram-LM (SentencePiece-style) tokenizer — Kudo 2018,
  // arXiv:1804.10959, restricted to the word level with bounded piece
  // and word lengths so the DuckDB oracle can unroll the exact same
  // Viterbi DP position by position.
  private val UniMaxWord = graft.expressions.UnigramOps.MaxWord // 16
  private val UniMaxPiece = graft.expressions.UnigramOps.MaxPiece // 4
  private val UniSeedV = 120 // multi-char seed pieces kept
  private val UniVocab = 80 // multi-char pieces kept per M-step
  private val UniEmRounds = 2

  /** Distinct eligible training words with corpus frequency. */
  private def uniWords(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(tokens($"text")).as("w"))
      .filter(length($"w").between(1, UniMaxWord))
      .groupBy($"w").agg(count(lit(1)).as("f"))
  }

  /** Quantized scaled log-prob column: ln(cnt/total) × 10⁹ rounded
    * half-up to a BIGINT — integer Viterbi sums, exact comparisons;
    * the quantization itself is the one float step (the `text_lm_*`
    * ulp-straddle convention, documented in BASELINE). */
  private def lpsCol(cnt: Column, total: Long): Column =
    roundHalfUp((log(cnt.cast("double")) - log(lit(total.toDouble))) *
      lit(1000000000.0), 0).cast("long")

  /** EM-train the unigram vocabulary: seed = all full-length
    * substrings (1..[[UniMaxPiece]]) of eligible words weighted by
    * word frequency (top [[UniSeedV]] multi-char + ALL single chars —
    * the coverage floor), then [[UniEmRounds]] rounds of
    * E-step (Viterbi-segment every distinct word, row-local via the
    * codegen'd `unigram_seg` over a one-row broadcast of the sorted
    * vocab) and M-step (usage counts; single chars keep add-one
    * smoothing so ln stays defined; multi-char pruned to top
    * [[UniVocab]] by count desc, piece asc). Deterministic end to
    * end: integer counts, quantized scores, total-order tie-breaks.
    *
    * Scale: the E-step is a map stage over DISTINCT words (corpus
    * token multiplicity collapses into the frequency column), the
    * M-step one map-side-combined keyed aggregate of piece usages;
    * the vocabulary is a ~200-row broadcast. Production trains on a
    * word-frequency sample exactly like this and ships the piece
    * table — which is what the store twin persists. */
  private[graft] def unigramVocab(s: SparkSession,
      docs: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val words = uniWords(docs).cache()
    val seeds = words
      .select($"f", explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($UniMaxPiece,
           |         length(w) - i + 1)),
           |  l -> substring(w, i, l))))""".stripMargin)).as("piece"))
      .groupBy($"piece").agg(sum($"f").as("cnt"))
      .cache()
    val chars = seeds.filter(length($"piece") === 1)
    // Every vocab frame below is MATERIALIZED (localCheckpoint): each
    // EM round references its predecessor several times (the
    // segmenter's total probe + packed broadcast, the usage join's
    // two branches) and the callers reference the final vocab 2-3
    // more times — left lazy, Catalyst re-expands the whole EM
    // lineage per reference (measured at sf0.1: 13 `unigram_seg`
    // sites / 136 Exchanges in one plan, i.e. each round's Viterbi
    // pass over the distinct words ran ~4x). The frames are
    // vocabulary-bounded (≤ |chars| + UniSeedV rows), so each
    // checkpoint is a KB-sized block and its job is the total-probe
    // job the round already paid.
    var voc = chars.unionByName(
      seeds.filter(length($"piece") >= 2)
        .orderBy($"cnt".desc, $"piece".asc).limit(UniSeedV))
      .localCheckpoint()
    for (_ <- 1 to UniEmRounds) {
      val usage = uniUsage(s, words, voc).localCheckpoint()
      voc = chars.select($"piece")
        .join(usage, Seq("piece"), "left")
        .select($"piece", (coalesce($"cnt", lit(0L)) + lit(1L)).as("cnt"))
        .unionByName(usage.filter(length($"piece") >= 2)
          .orderBy($"cnt".desc, $"piece".asc).limit(UniVocab))
        .localCheckpoint()
    }
    voc
  }

  /** One E-step's piece-usage counts over the distinct-word frame. */
  private def uniUsage(s: SparkSession, words: DataFrame,
      voc: DataFrame): DataFrame = {
    import s.implicits._
    uniSegmented(s, words, voc)
      .filter($"seg".isNotNull)
      .select($"f", explode($"seg").as("piece"))
      .groupBy($"piece").agg(sum($"f").as("cnt"))
  }

  /** Viterbi-segment the word frame with the given vocab counts:
    * scores quantize off the vocab total, the sorted piece/score
    * arrays ride one broadcast row, and `unigram_seg` runs the DP
    * inside codegen. */
  private def uniSegmented(s: SparkSession, words: DataFrame,
      voc: DataFrame): DataFrame = {
    import s.implicits._
    val totRow = voc.agg(sum($"cnt")).head
    val tot = if (totRow.isNullAt(0)) 1L else totRow.getLong(0)
    val packed = voc.select($"piece", lpsCol($"cnt", tot).as("lps"))
      .agg(
        expr("transform(array_sort(collect_list(struct(piece, lps)))," +
          " x -> x.piece)").as("pieces"),
        expr("transform(array_sort(collect_list(struct(piece, lps)))," +
          " x -> x.lps)").as("scores"))
    words.crossJoin(broadcast(packed))
      .select($"w", $"f",
        expr("unigram_seg(w, pieces, scores)").as("seg"))
  }

  /** Final trained vocabulary: (piece, cnt, logprob). */
  private def textUnigramTrain(s: SparkSession, d: String) = {
    import s.implicits._
    val voc = unigramVocab(s, Tables.documents(s, d))
    val totRow = voc.agg(sum($"cnt")).head
    val tot = if (totRow.isNullAt(0)) 1L else totRow.getLong(0)
    voc.select($"piece", $"cnt".cast("long").as("cnt"),
        roundHalfUp(log($"cnt".cast("double")) - log(lit(tot.toDouble)), 9)
          .as("logprob"))
      .orderBy($"piece")
  }

  /** Tokenize the corpus with the trained unigram model: per doc the
    * word count, unigram token count (words longer than
    * [[UniMaxWord]] — or outside the trained coverage — fall back to
    * one token per character; engine and oracle share the rule via
    * the NULL→length coalesce), total chars, and chars-per-token. */
  private def textTokensUnigram(s: SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    uniTokensFrom(s, docs, unigramVocab(s, docs))
  }

  /** The encode pass alone, from any (piece, cnt) vocab frame — the
    * half a production pipeline runs daily against the PERSISTED
    * piece table (spec-proven parquet round-trip). */
  private[graft] def uniTokensFrom(s: SparkSession, docs: DataFrame,
      voc: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val docw = docs.select($"doc_id", explode(tokens($"text")).as("w"))
    val nps = uniSegmented(s,
        docw.select($"w").distinct().withColumn("f", lit(1L)), voc)
      .select($"w",
        coalesce(size($"seg"), length($"w")).cast("long").as("np"))
    docw.join(nps, Seq("w"))
      .groupBy($"doc_id")
      .agg(count(when($"w" =!= "", lit(1))).as("n_words"),
        sum($"np").as("n_tokens_unigram"),
        sum(length($"w")).cast("long").as("n_chars"))
      .select($"doc_id", $"n_words", $"n_tokens_unigram", $"n_chars",
        roundHalfUp(lit(1.0) * $"n_chars" /
          nullif($"n_tokens_unigram".cast("double"), lit(0.0)), 6)
          .as("chars_per_token"))
      .orderBy($"doc_id")
  }

  /** Tokenize from the persisted-piece-store shape: the trained vocab
    * (the store content, derived in-query — the
    * `bpe_encode_from_store` stand-in convention; the spec proves the
    * parquet round-trip identical) feeds [[uniTokensFrom]], so the
    * oracle is exactly `text_tokens_unigram`'s. */
  private def textTokensUnigramStore(s: SparkSession, d: String) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val store = unigramVocab(s, docs)
      .select($"piece", $"cnt".cast("long").as("cnt"))
    uniTokensFrom(s, docs, store)
  }

  /** Unigram DETOKENIZE round-trip — `bpe_decode`'s twin on the
    * SentencePiece path: Viterbi-segment every word with the trained
    * vocab, concatenate the chosen pieces back, rebuild each
    * document's token stream in position order, and prove
    * decode(encode(x)) = normalized x per document. Words outside the
    * segmenter's coverage (over-[[UniMaxWord]], or uncovered) fall
    * back to the per-char encoding whose concat is the word itself —
    * the NULL→word coalesce BOTH engines apply, so the fallback path
    * is round-trip-proven too. The oracle walks ITS OWN backpointer
    * chain to re-extract pieces in start-position order, so the
    * cross-engine `decoded_digest` gate proves byte-identical
    * reconstruction, not just matching booleans.
    *
    * Scale: training is `text_unigram_train`'s folds; segmentation is
    * row-local codegen'd `unigram_seg` over DISTINCT words; the
    * per-doc rebuild is one doc-keyed fold over (pos, word) pairs. */
  private def textDetokenizeUnigram(s: SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val docs = Tables.documents(s, d)
    val voc = unigramVocab(s, docs)
    val docw = docs.select($"doc_id",
      posexplode(tokens($"text")).as(Seq("pos", "w")))
    val dec = uniSegmented(s,
        docw.select($"w").distinct().withColumn("f", lit(1L)), voc)
      .select($"w", coalesce(array_join($"seg", ""), $"w").as("dw"))
    val rebuilt = docw.join(dec, Seq("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(pos, dw))), x -> x.dw), ' ')").as("dtext"))
    docs.select($"doc_id",
        md5(array_join(tokens($"text"), " ")).as("rawd"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_words", lit(0L)).as("n_words"),
        md5(coalesce($"dtext", lit(""))).as("decoded_digest"),
        (md5(coalesce($"dtext", lit(""))) === $"rawd").as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  private def unigramDetokenizeOracle: String =
    s"""WITH $uniChainSql,
       |${uniSegSql(uniFinal, "ud")},
       |udp AS (
       |  ${(1 to UniMaxWord)
            .map(t => s"SELECT w, pos, piece FROM ud_w_$t")
            .mkString(" UNION ALL ")}
       |),
       |wdec AS MATERIALIZED (
       |  SELECT w, string_agg(piece, '' ORDER BY pos) AS dw
       |  FROM udp GROUP BY w
       |),
       |udocw AS (
       |  SELECT doc_id, CAST(s.pos AS BIGINT) - 1 AS pos, s.w FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'w': t[CAST(i AS INT)]}
       |              for i in range(1, len(t) + 1)]) AS s
       |    FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents))
       |),
       |rebuilt AS (
       |  SELECT u.doc_id, COUNT(*) AS n_words,
       |    string_agg(COALESCE(d.dw, u.w), ' ' ORDER BY u.pos) AS dtext
       |  FROM udocw u LEFT JOIN wdec d ON d.w = u.w
       |  GROUP BY u.doc_id
       |)
       |SELECT x.doc_id,
       |  CAST(COALESCE(r.n_words, 0) AS BIGINT) AS n_words,
       |  md5(COALESCE(r.dtext, '')) AS decoded_digest,
       |  md5(COALESCE(r.dtext, '')) =
       |    md5(array_to_string(${tokensSql("text")}, ' ')) AS roundtrip_ok
       |FROM documents x LEFT JOIN rebuilt r ON r.doc_id = x.doc_id
       |ORDER BY x.doc_id""".stripMargin

  /** The per-word unigram token costs (w, np) — Viterbi piece count
    * with the NULL→length fallback — over an arbitrary corpus, for
    * callers that re-tokenize rewritten text (v3 prep): unigram
    * tokenization is per-word, so any doc rewrite that removes whole
    * tokens re-tokenizes as a SUM over this table, no re-training. */
  private[graft] def uniWordCostsOf(s: SparkSession, docs: DataFrame)
      : DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val words = docs.select(explode(tokens($"text")).as("w")).distinct()
      .withColumn("f", lit(1L))
    uniSegmented(s, words, unigramVocab(s, docs))
      .select($"w",
        coalesce(size($"seg"), length($"w")).cast("long").as("np"))
  }

  // ---------------------------------------------------------------
  // WordPiece (BERT-style) tokenizer — Devlin et al. 2019,
  // arXiv:1810.04805 §A: greedy longest-match-first segmentation over
  // a ##-marked vocabulary, the third tokenizer family alongside the
  // BPE merge loop and the unigram-LM Viterbi. Same bounded
  // piece/word lengths as the unigram family
  // ([[graft.expressions.WordPieceOps]]) so the oracle unrolls the
  // identical greedy walk step by step. Greedy-vs-Viterbi is the real
  // semantic difference: WordPiece commits to the longest LOCAL match
  // even when a shorter first piece would yield fewer total pieces.
  private val WpVocab = 100
  private val WpMaxPiece = graft.expressions.WordPieceOps.MaxPiece // 4
  private val WpMaxWord = graft.expressions.WordPieceOps.MaxWord // 16

  /** Candidate pieces of each eligible word weighted by corpus word
    * frequency: word-initial substrings verbatim, word-internal
    * substrings in their `##` continuation form (lengths
    * 1..[[WpMaxPiece]]). */
  private def wpCandidates(words: DataFrame): DataFrame = {
    import words.sparkSession.implicits._
    words.select($"f", explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           |  transform(sequence(1, least($WpMaxPiece,
           |      length(w) - i + 1)),
           |    l -> CASE WHEN i = 1 THEN substring(w, i, l)
           |         ELSE '##' || substring(w, i, l) END)))""".stripMargin))
        .as("piece"))
      .groupBy($"piece").agg(sum($"f").as("cnt"))
  }

  /** Frequency-seeded WordPiece vocabulary: ALL effective-length-1
    * pieces (raw length, `##` marker excluded — the coverage floor
    * that keeps every eligible word segmentable, so `[UNK]` is the
    * over-length rule, not a coverage accident) + the top [[WpVocab]]
    * longer pieces by (cnt desc, piece asc). The marker-length rule is
    * string-syntactic (a piece whose raw text starts with `##` is
    * binned as if marked) — mirrored verbatim in the oracle, so both
    * engines share the vocabulary exactly. */
  private[graft] def wordpieceVocab(s: SparkSession,
      docs: DataFrame): DataFrame = {
    import s.implicits._
    val cands = wpCandidates(uniWords(docs))
    val rawLen = when($"piece".startsWith("##"), length($"piece") - 2)
      .otherwise(length($"piece"))
    cands.filter(rawLen === 1)
      .unionByName(cands.filter(rawLen >= 2)
        .orderBy($"cnt".desc, $"piece".asc).limit(WpVocab))
  }

  /** The trained WordPiece vocabulary — (piece, cnt, is_continuation).
    * Scale: candidates explode DISTINCT words (multiplicity collapses
    * into the frequency column), the fold is one map-side-combined
    * keyed aggregate, and the kept vocabulary is a few-hundred-row
    * broadcast — the tokenizer-training shape shared with
    * `text_unigram_train`. */
  private def wordpieceVocabOp(s: SparkSession, d: String) = {
    import s.implicits._
    wordpieceVocab(s, Tables.documents(s, d))
      .select($"piece", $"cnt".cast("long").as("cnt"),
        $"piece".startsWith("##").as("is_continuation"))
      .orderBy($"piece")
  }

  /** Encode pass from any (piece, cnt) vocab frame: greedy
    * longest-match per DISTINCT word (row-local codegen'd
    * `wordpiece_seg` over a one-row broadcast of the sorted vocab),
    * multiplicity restored by the word join, per-doc fold. Words the
    * segmenter refuses (over-[[WpMaxWord]]) count ONE `[UNK]` token —
    * BERT's rule, and the semantic difference from the unigram
    * family's per-char fallback. */
  private[graft] def wpTokensFrom(s: SparkSession, docs: DataFrame,
      voc: DataFrame): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val packed = voc.agg(expr("array_sort(collect_list(piece))").as("pieces"))
    val docw = docs.select($"doc_id", explode(tokens($"text")).as("w"))
    val nps = docw.select($"w").distinct()
      .crossJoin(broadcast(packed))
      .select($"w", expr("wordpiece_seg(w, pieces)").as("seg"))
      .select($"w",
        coalesce(size($"seg").cast("long"), lit(1L)).as("np"),
        $"seg".isNull.cast("long").as("unk"))
    docw.join(nps, Seq("w"))
      .groupBy($"doc_id")
      .agg(count(when($"w" =!= "", lit(1))).as("n_words"),
        sum($"np").as("n_tokens_wordpiece"),
        sum($"unk").as("n_unk_words"),
        sum(length($"w")).cast("long").as("n_chars"))
      .select($"doc_id", $"n_words", $"n_tokens_wordpiece",
        $"n_unk_words", $"n_chars",
        roundHalfUp(lit(1.0) * $"n_chars" /
          nullif($"n_tokens_wordpiece".cast("double"), lit(0.0)), 6)
          .as("chars_per_token"))
      .orderBy($"doc_id")
  }

  /** Tokenize the corpus with the trained WordPiece vocabulary. */
  private def textTokensWordpiece(s: SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    wpTokensFrom(s, docs, wordpieceVocab(s, docs))
  }

  /** Shared vocab CTEs (`wwords`, `wcand`, `wvoc`) — the engine's
    * candidate expansion and keep rule re-spelled. */
  private def wpVocabSql: String =
    s"""wwords AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS f FROM (
       |    SELECT unnest(${tokensSql("text")}) AS w FROM documents) t
       |  WHERE len(w) BETWEEN 1 AND $WpMaxWord
       |  GROUP BY w
       |),
       |wcand AS MATERIALIZED (
       |  SELECT CASE WHEN s.i = 1
       |           THEN substr(w, CAST(s.i AS INT), CAST(t.l AS INT))
       |         ELSE '##' || substr(w, CAST(s.i AS INT), CAST(t.l AS INT))
       |         END AS piece,
       |    SUM(f) AS cnt
       |  FROM wwords
       |  JOIN range(1, ${WpMaxWord + 1}) s(i) ON s.i <= len(w)
       |  JOIN range(1, ${WpMaxPiece + 1}) t(l) ON t.l <= len(w) - s.i + 1
       |  GROUP BY 1
       |),
       |wvoc AS MATERIALIZED (
       |  SELECT piece, cnt FROM wcand
       |  WHERE (CASE WHEN piece LIKE '##%' THEN len(piece) - 2
       |         ELSE len(piece) END) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM wcand
       |    WHERE (CASE WHEN piece LIKE '##%' THEN len(piece) - 2
       |           ELSE len(piece) END) >= 2
       |    ORDER BY cnt DESC, piece ASC LIMIT $WpVocab) kept
       |)""".stripMargin

  private def wordpieceVocabOracle: String =
    s"""WITH $wpVocabSql
       |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |  (piece LIKE '##%') AS is_continuation
       |FROM wvoc
       |ORDER BY piece""".stripMargin

  /** Greedy walk unrolled: step CTE t advances every live word by its
    * longest matching piece (MAX(l) over the vocab join — the greedy
    * commit), carries finished/`[UNK]` words through, and every word
    * of length ≤ [[WpMaxWord]] finishes within [[WpMaxWord]] steps
    * because each step consumes ≥ 1 char. */
  private def wpWalkSql: String = {
    val steps = (1 to WpMaxWord).map { t =>
      s"""wp_$t AS MATERIALIZED (
         |  SELECT w, pos, np, unk FROM wp_${t - 1}
         |  WHERE pos >= len(w) OR unk
         |  UNION ALL
         |  SELECT p.w,
         |    CASE WHEN m.l IS NULL THEN len(p.w)
         |         ELSE p.pos + CAST(m.l AS INT) END AS pos,
         |    CASE WHEN m.l IS NULL THEN 1 ELSE p.np + 1 END AS np,
         |    (m.l IS NULL) AS unk
         |  FROM (SELECT * FROM wp_${t - 1}
         |        WHERE pos < len(w) AND NOT unk) p
         |  LEFT JOIN (
         |    SELECT q.w, q.pos, MAX(t.l) AS l
         |    FROM (SELECT DISTINCT w, pos FROM wp_${t - 1}
         |          WHERE pos < len(w) AND NOT unk) q
         |    JOIN range(1, ${WpMaxPiece + 1}) t(l)
         |      ON t.l <= len(q.w) - q.pos
         |    JOIN wvoc v ON v.piece =
         |      CASE WHEN q.pos = 0 THEN substr(q.w, 1, CAST(t.l AS INT))
         |           ELSE '##' || substr(q.w, q.pos + 1, CAST(t.l AS INT))
         |      END
         |    GROUP BY q.w, q.pos) m ON m.w = p.w AND m.pos = p.pos
         |)""".stripMargin
    }.mkString(",\n")
    s"""wp_0 AS (
       |  SELECT w, 0 AS pos, 0 AS np, FALSE AS unk FROM wwords
       |),
       |$steps,
       |wnp AS MATERIALIZED (
       |  SELECT w, np, CASE WHEN unk THEN 1 ELSE 0 END AS unk
       |  FROM wp_$WpMaxWord
       |)""".stripMargin
  }

  private def wordpieceTokensOracle: String =
    s"""WITH $wpVocabSql,
       |$wpWalkSql,
       |wdocw AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS w FROM documents
       |)
       |SELECT doc_id,
       |  COUNT(*) FILTER (WHERE d.w <> '') AS n_words,
       |  CAST(SUM(CASE WHEN len(d.w) = 0 THEN 0
       |           WHEN len(d.w) > $WpMaxWord THEN 1
       |           ELSE n.np END) AS BIGINT) AS n_tokens_wordpiece,
       |  CAST(SUM(CASE WHEN len(d.w) > $WpMaxWord THEN 1
       |           ELSE COALESCE(n.unk, 0) END) AS BIGINT) AS n_unk_words,
       |  CAST(SUM(len(d.w)) AS BIGINT) AS n_chars,
       |  ${roundHalfUpSql(
           "1.0 * SUM(len(d.w)) / " +
             "NULLIF(CAST(SUM(CASE WHEN len(d.w) = 0 THEN 0 " +
             s"WHEN len(d.w) > $WpMaxWord THEN 1 " +
             "ELSE n.np END) AS DOUBLE), 0.0)",
           6)} AS chars_per_token
       |FROM wdocw d LEFT JOIN wnp n ON n.w = d.w
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** `pipeline_docprep_v3` — the attributed prep chain over the
    * round-15 stages, per language: (1) the GOPHER battery gates
    * documents ([[gopherFlagsOf]] — exits attributed as
    * `n_gopher_fail`), (2) the corpus-wide duplicate-SPAN manifest
    * ([[spanExcise]] — built over the FULL corpus, the span-store
    * shape, because gram duplication is a corpus property, then
    * APPLIED to the survivors) excises tokens (attributed as
    * `tokens_excised`), (3) the surviving text re-tokenizes under the
    * trained UNIGRAM vocab — per-word costs from [[uniWordCostsOf]],
    * so the post-rewrite count is an exact per-position sum, no
    * re-segmentation — and (4) the post-prep token mass feeds the
    * TEMPERATURE mix (`corpus_mix_temperature`'s exact algebra:
    * √p quantized to DECIMAL(27,6), decimal-exact denominator), so
    * the emitted sampling weights describe the corpus a loader would
    * actually see, not the raw one. DocprepV3Spec reconciles every
    * stage against its owning catalog op.
    *
    * Scale: each stage is its owning op's plan (row-local gate,
    * span-volume-bounded anti-join, broadcast per-word costs,
    * lang-bounded mix fold) — the chain adds joins, not new shuffle
    * classes. */
  private def docPrepV3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    GraftFunctions.ensure(s)
    val docs = Tables.documents(s, d)
    val gop = gopherFlagsOf(s, docs).select($"doc_id", $"keep")
    val keptDocs = docs
      .join(gop.filter($"keep").select($"doc_id"), "doc_id")
    val toks = keptDocs.select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", size($"w").cast("long").as("n_before"),
        posexplode($"w"))
      .select($"doc_id", $"n_before",
        ($"pos" + 1).cast("long").as("p"), $"col".as("tok"))
    val removed = spanExcise(s, docs)
      .select($"doc_id",
        explode(sequence($"span_start", $"span_end")).as("p"))
    val nps = uniWordCostsOf(s, docs)
    val perDoc = toks.join(removed, Seq("doc_id", "p"), "left_anti")
      .join(nps, $"tok" === $"w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_after"), sum($"np").as("n_uni"))
    val base = keptDocs
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_before"))
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_before",
        coalesce($"n_after", lit(0L)).as("n_after"),
        coalesce($"n_uni", lit(0L)).as("n_uni"))
    val rpt = docs.select($"doc_id", $"lang").join(gop, "doc_id")
      .join(base, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        countWhen(!$"keep").as("n_gopher_fail"),
        countWhen($"keep").as("n_kept"),
        sum(when($"keep", $"n_before" - $"n_after").otherwise(0L))
          .cast("long").as("tokens_excised"),
        sum(when($"keep", $"n_uni").otherwise(0L))
          .cast("long").as("n_tokens_unigram"))
    val total = rpt.agg(sum($"n_tokens_unigram").cast("long").as("tot"))
    val win = Window.partitionBy(lit(1))
    val p = $"n_tokens_unigram".cast("double") /
      nullif($"tot".cast("double"), lit(0.0))
    val qRaw = $"tw".cast("double") / $"denom".cast("double")
    rpt.crossJoin(broadcast(total))
      .withColumn("p", p)
      .withColumn("tw",
        sqrt($"p").cast(org.apache.spark.sql.types.DecimalType(27, 6)))
      .withColumn("denom", sum($"tw").over(win))
      .select($"lang", $"n_docs", $"n_gopher_fail", $"n_kept",
        $"tokens_excised", $"n_tokens_unigram",
        roundHalfUp($"p", 6).as("token_share"),
        roundHalfUp(qRaw, 6).as("sample_share"),
        roundHalfUp(qRaw / nullif($"p", lit(0.0)), 6).as("epochs"))
      .orderBy($"lang")
  }

  private def docPrepV3Oracle: String =
    s"""WITH ${gopherCtes("v")},
       |vkeep AS MATERIALIZED (
       |  SELECT doc_id, $gopherKeepSql AS keep FROM vm
       |),
       |$uniChainSql,
       |${uniSegSql(uniFinal, "uv")},
       |vnps AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS np FROM uv_path GROUP BY w
       |),
       |$spanExciseCtes,
       |vspans AS (
       |  SELECT doc_id, MIN(p) AS span_start,
       |    MAX(p) + ${SpanK - 1} AS span_end
       |  FROM grp GROUP BY doc_id, island
       |),
       |vrem AS MATERIALIZED (
       |  SELECT doc_id, CAST(unnest(range(span_start, span_end + 1))
       |    AS BIGINT) AS p
       |  FROM vspans
       |),
       |vtok AS (
       |  SELECT t.doc_id, CAST(len(t.words) AS BIGINT) AS n_before,
       |    CAST(s.p AS BIGINT) AS p, t.words[CAST(s.p AS INT)] AS tok
       |  FROM toks t
       |  JOIN vkeep k ON k.doc_id = t.doc_id AND k.keep,
       |  LATERAL (SELECT unnest(range(1, len(t.words) + 1)) AS p) s
       |),
       |vkept AS (
       |  SELECT kt.doc_id, kt.tok FROM vtok kt
       |  LEFT JOIN vrem r ON r.doc_id = kt.doc_id AND r.p = kt.p
       |  WHERE r.p IS NULL
       |),
       |vpd AS MATERIALIZED (
       |  SELECT k.doc_id, COUNT(*) AS n_after,
       |    CAST(SUM(COALESCE(n.np, len(k.tok))) AS BIGINT) AS n_uni
       |  FROM vkept k LEFT JOIN vnps n ON n.w = k.tok
       |  GROUP BY k.doc_id
       |),
       |vdoc AS (
       |  SELECT t.doc_id, CAST(len(t.words) AS BIGINT) AS n_before,
       |    COALESCE(p.n_after, 0) AS n_after, COALESCE(p.n_uni, 0) AS n_uni
       |  FROM toks t
       |  JOIN vkeep k ON k.doc_id = t.doc_id AND k.keep
       |  LEFT JOIN vpd p ON p.doc_id = t.doc_id
       |),
       |vrpt AS MATERIALIZED (
       |  SELECT d.lang,
       |    COUNT(*) AS n_docs,
       |    CAST(SUM(CASE WHEN NOT k.keep THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_gopher_fail,
       |    CAST(SUM(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_kept,
       |    CAST(SUM(CASE WHEN k.keep THEN b.n_before - b.n_after
       |             ELSE 0 END) AS BIGINT) AS tokens_excised,
       |    CAST(SUM(CASE WHEN k.keep THEN b.n_uni ELSE 0 END) AS BIGINT)
       |      AS n_tokens_unigram
       |  FROM documents d
       |  JOIN vkeep k ON k.doc_id = d.doc_id
       |  LEFT JOIN vdoc b ON b.doc_id = d.doc_id
       |  GROUP BY d.lang
       |),
       |vtot AS (SELECT CAST(SUM(n_tokens_unigram) AS BIGINT) AS tot
       |         FROM vrpt),
       |vw AS (
       |  SELECT lang, n_docs, n_gopher_fail, n_kept, tokens_excised,
       |    n_tokens_unigram,
       |    CAST(n_tokens_unigram AS DOUBLE) /
       |      NULLIF(CAST(tot AS DOUBLE), 0.0) AS p,
       |    CAST(SQRT(CAST(n_tokens_unigram AS DOUBLE) /
       |              NULLIF(CAST(tot AS DOUBLE), 0.0))
       |      AS DECIMAL(27,6)) AS w
       |  FROM vrpt, vtot
       |),
       |vdnm AS (SELECT SUM(w) AS denom FROM vw)
       |SELECT lang, n_docs, n_gopher_fail, n_kept, tokens_excised,
       |  n_tokens_unigram,
       |  ${roundHalfUpSql("p", 6)} AS token_share,
       |  ${roundHalfUpSql(
          "CAST(w AS DOUBLE) / CAST(denom AS DOUBLE)", 6)} AS sample_share,
       |  ${roundHalfUpSql(
          "(CAST(w AS DOUBLE) / CAST(denom AS DOUBLE)) / NULLIF(p, 0.0)",
          6)} AS epochs
       |FROM vw, vdnm
       |ORDER BY lang""".stripMargin

  // ---- unigram oracle builders -----------------------------------

  private def uniLpsSql(cntExpr: String, totSql: String): String =
    s"CAST(${roundHalfUpSql(
      s"(ln(CAST($cntExpr AS DOUBLE)) - ln(CAST(($totSql) AS DOUBLE)))" +
        " * 1000000000", 0)} AS BIGINT)"

  /** The shared WITH-chain: words → seed → EM rounds → final vocab
    * `uvoc_${UniEmRounds + 1}`. Each EM round unrolls the Viterbi DP
    * one CTE per position (the engine expression's loop, verbatim:
    * same quantized integer scores, same score-desc/j-asc tie-break)
    * plus a backpointer walk that re-extracts the chosen pieces. */
  private def uniChainSql: String = {
    val seed =
      s"""uwords AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS f FROM (
         |    SELECT unnest(${tokensSql("text")}) AS w FROM documents) t
         |  WHERE len(w) BETWEEN 1 AND $UniMaxWord
         |  GROUP BY w
         |),
         |useed AS MATERIALIZED (
         |  SELECT substr(t.w, CAST(t.i AS INT), l.l) AS piece,
         |    CAST(SUM(t.f) AS BIGINT) AS cnt
         |  FROM (SELECT w, f, unnest(range(1, len(w) + 1)) AS i
         |        FROM uwords) t
         |  CROSS JOIN (VALUES (1), (2), (3), (4)) l(l)
         |  WHERE t.i + l.l - 1 <= len(t.w)
         |  GROUP BY piece
         |),
         |uchars AS MATERIALIZED (
         |  SELECT piece, cnt FROM useed WHERE len(piece) = 1
         |),
         |uvoc_1 AS MATERIALIZED (
         |  SELECT piece, cnt FROM uchars
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM useed WHERE len(piece) >= 2
         |    ORDER BY cnt DESC, piece ASC LIMIT $UniSeedV)
         |)""".stripMargin
    val rounds = (1 to UniEmRounds).map { r =>
      s"""${uniSegSql(s"uvoc_$r", s"u$r")},
         |uusage_$r AS MATERIALIZED (
         |  SELECT u.piece, CAST(SUM(wo.f) AS BIGINT) AS cnt
         |  FROM u${r}_path u JOIN uwords wo ON wo.w = u.w
         |  GROUP BY u.piece
         |),
         |uvoc_${r + 1} AS MATERIALIZED (
         |  SELECT c.piece, COALESCE(u.cnt, 0) + 1 AS cnt
         |  FROM uchars c LEFT JOIN uusage_$r u ON u.piece = c.piece
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM uusage_$r WHERE len(piece) >= 2
         |    ORDER BY cnt DESC, piece ASC LIMIT $UniVocab)
         |)""".stripMargin
    }.mkString(",\n")
    s"$seed,\n$rounds"
  }

  /** One full Viterbi pass with vocab `voc`, CTE prefix `px`: scores
    * `${px}_scv`, DP per position, backpointer union `${px}_dp`, walk
    * `${px}_w_*`, and the chosen-piece rows `${px}_path (w, piece)`
    * (one row per used piece occurrence). */
  private def uniSegSql(voc: String, px: String): String = {
    val scv =
      s"""${px}_scv AS MATERIALIZED (
         |  SELECT piece,
         |    ${uniLpsSql("cnt", s"SELECT SUM(cnt) FROM $voc")} AS lps
         |  FROM $voc
         |)""".stripMargin
    val dp0 =
      s"""${px}_dp_0 AS (
         |  SELECT w, CAST(0 AS BIGINT) AS score, 0 AS j, 0 AS pos
         |  FROM uwords
         |)""".stripMargin
    val dps = (1 to UniMaxWord).map { i =>
      val preds = (math.max(0, i - UniMaxPiece) until i)
        .map(j => s"SELECT w, score, pos FROM ${px}_dp_$j")
        .mkString(" UNION ALL ")
      s"""${px}_dp_$i AS MATERIALIZED (
         |  SELECT w, score, j, pos FROM (
         |    SELECT d.w, d.score + v.lps AS score, d.pos AS j,
         |      $i AS pos,
         |      ROW_NUMBER() OVER (PARTITION BY d.w
         |        ORDER BY d.score + v.lps DESC, d.pos ASC) AS rn
         |    FROM ($preds) d
         |    JOIN ${px}_scv v
         |      ON v.piece = substr(d.w, d.pos + 1, $i - d.pos)
         |    WHERE len(d.w) >= $i
         |  ) x WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val dpall = s"""${px}_dp AS MATERIALIZED (
         |  ${(1 to UniMaxWord)
            .map(i => s"SELECT w, j, pos FROM ${px}_dp_$i")
            .mkString(" UNION ALL ")}
         |)""".stripMargin
    val wk0 =
      s"""${px}_w_0 AS (SELECT w, len(w) AS pos FROM uwords)""".stripMargin
    val wks = (1 to UniMaxWord).map { t =>
      s"""${px}_w_$t AS MATERIALIZED (
         |  SELECT p.w, d.j AS pos,
         |    substr(p.w, d.j + 1, p.pos - d.j) AS piece
         |  FROM ${px}_w_${t - 1} p
         |  JOIN ${px}_dp d ON d.w = p.w AND d.pos = p.pos
         |  WHERE p.pos > 0
         |)""".stripMargin
    }.mkString(",\n")
    val path = s"""${px}_path AS MATERIALIZED (
         |  ${(1 to UniMaxWord)
            .map(t => s"SELECT w, piece FROM ${px}_w_$t")
            .mkString(" UNION ALL ")}
         |)""".stripMargin
    Seq(scv, dp0, dps, dpall, wk0, wks, path).mkString(",\n")
  }

  private def uniFinal: String = s"uvoc_${UniEmRounds + 1}"

  private def unigramTrainOracle: String =
    s"""WITH $uniChainSql
       |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |  ${roundHalfUpSql(
           "ln(CAST(cnt AS DOUBLE)) - " +
             s"ln(CAST((SELECT SUM(cnt) FROM $uniFinal) AS DOUBLE))",
           9)} AS logprob
       |FROM $uniFinal
       |ORDER BY piece""".stripMargin

  /** Tokens oracle: the train chain + one more Viterbi pass with the
    * final vocab, then the per-doc fold with the NULL→length(w)
    * fallback (covers both over-length and uncovered words — the
    * engine's coalesce(size(seg), length(w)) rule). */
  private def unigramTokensOracle: String =
    s"""WITH $uniChainSql,
       |${uniSegSql(uniFinal, "uf")},
       |unps AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS np FROM uf_path GROUP BY w
       |),
       |udocw AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS w FROM documents
       |)
       |SELECT doc_id,
       |  COUNT(*) FILTER (WHERE d.w <> '') AS n_words,
       |  CAST(SUM(COALESCE(n.np, len(d.w))) AS BIGINT)
       |    AS n_tokens_unigram,
       |  CAST(SUM(len(d.w)) AS BIGINT) AS n_chars,
       |  ${roundHalfUpSql(
           "1.0 * SUM(len(d.w)) / " +
             "NULLIF(CAST(SUM(COALESCE(n.np, len(d.w))) AS DOUBLE), 0.0)",
           6)} AS chars_per_token
       |FROM udocw d LEFT JOIN unps n ON n.w = d.w
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("rank_bm25", rankBm25 _, bm25Oracle),
    OpDef("rank_bm25_from_store", rankBm25FromStore _, bm25FromStoreOracle),
    OpDef("lexical_index_merge", lexicalIndexMergeOp _,
      fromStoreOracleFor(BmQueryM.map(("m1", _)))),
    OpDef("sample_hash", sampleHash _,
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hash60Sql("'smp:' || doc_id")} % 100 < 10
         |ORDER BY doc_id""".stripMargin),
    OpDef("sample_split", sampleSplit _,
      s"""SELECT doc_id,
         |  CASE WHEN ${hash60Sql("'split:' || doc_id")} % 100 < 90 THEN 'train'
         |       WHEN ${hash60Sql("'split:' || doc_id")} % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_entropy", textEntropy _, entropyOracle),
    OpDef("text_stats", textStats _,
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS w,
         |    len(${normalizeTextSql("text")}) AS n_chars_norm
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(w) AS n_tokens,
         |  n_chars_norm,
         |  ${roundHalfUpSql("1.0 * len(array_to_string(w, '')) / len(w)", 6)} AS avg_token_len
         |FROM toks
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_tfidf", textTfidf _, tfidfOracle),
    OpDef("text_lm_score", textLmScore _, lmScoreOracle),
    OpDef("text_lm_bigram", textLmBigram _, lmBigramOracle),
    OpDef("bpe_train_merges", bpeTrainMerges _, bpeMergesOracle),
    OpDef("text_unigram_train", textUnigramTrain _, unigramTrainOracle),
    OpDef("text_tokens_unigram", textTokensUnigram _, unigramTokensOracle),
    OpDef("wordpiece_vocab", wordpieceVocabOp _, wordpieceVocabOracle),
    OpDef("text_tokens_wordpiece", textTokensWordpiece _,
      wordpieceTokensOracle),
    OpDef("text_tokens_unigram_store", textTokensUnigramStore _,
      unigramTokensOracle),
    OpDef("bpe_encode", bpeEncode _, bpeEncodeOracle),
    OpDef("bpe_encode_from_store", bpeEncodeFromStore _, bpeEncodeOracle),
    OpDef("bpe_decode", bpeDecode _, bpeDecodeOracle),
    OpDef("text_detokenize_unigram", textDetokenizeUnigram _,
      unigramDetokenizeOracle),
    OpDef("pipeline_docprep_v3", docPrepV3 _, docPrepV3Oracle),
    OpDef("text_dup_spans", textDupSpans _, dupSpansOracle),
    OpDef("text_span_excise", textSpanExcise _, spanExciseOracle),
    OpDef("text_span_rewrite", textSpanRewrite _, spanRewriteOracle),
    OpDef("text_source_terms", textSourceTerms _, sourceTermsOracle),
    OpDef("text_topk_terms", topkTerms _,
      s"""SELECT term, COUNT(*) AS occurrences
         |FROM (SELECT unnest(${tokensSql("text")}) AS term FROM documents)
         |GROUP BY term
         |ORDER BY occurrences DESC, term ASC
         |LIMIT 20""".stripMargin),
    OpDef("text_vocab_coverage", textVocabCoverage _,
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
         |),
         |vocab AS (
         |  SELECT term, 1 AS inv FROM (
         |    SELECT term, COUNT(*) AS n FROM toks GROUP BY term
         |    ORDER BY n DESC, term ASC LIMIT $VocabK)
         |)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |  CAST(COALESCE(SUM(v.inv), 0) AS BIGINT) AS n_in_vocab,
         |  CAST(FLOOR((1.0 - 1.0 * COALESCE(SUM(v.inv), 0) / COUNT(*)) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS oov_rate
         |FROM toks t LEFT JOIN vocab v ON t.term = v.term
         |GROUP BY t.doc_id
         |ORDER BY t.doc_id""".stripMargin),
    OpDef("text_heavy_hitters", textHeavyHitters _,
      s"""WITH toks AS (
         |  SELECT unnest(${tokensSql("text")}) AS term FROM documents
         |),
         |tot AS (SELECT COUNT(*) AS n_total FROM toks)
         |SELECT term, COUNT(*) AS occurrences
         |FROM toks, tot
         |GROUP BY term, n_total
         |HAVING COUNT(*) > n_total / $HhFraction
         |ORDER BY occurrences DESC, term ASC""".stripMargin),
    OpDef("inverted_index", invertedIndex _,
      s"""SELECT term, COUNT(DISTINCT doc_id) AS df,
         |  array_to_string(list_transform(list_sort(list(DISTINCT doc_id))[1:$IdxPostings], x -> CAST(x AS VARCHAR)), ',') AS postings
         |FROM (SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents)
         |GROUP BY term
         |HAVING COUNT(DISTINCT doc_id) >= $IdxDfMin
         |ORDER BY term""".stripMargin),
    OpDef("bpe_pair_stats", bpePairStats _,
      s"""WITH pairs AS (
         |  SELECT unnest([array_to_string(words[i:i+1], ' ')
         |                 for i in range(1, len(words))]) AS pair
         |  FROM (SELECT ${tokensSql("text")} AS words FROM documents)
         |  WHERE len(words) >= 2
         |)
         |SELECT pair, COUNT(*) AS occurrences
         |FROM pairs
         |GROUP BY pair
         |ORDER BY occurrences DESC, pair ASC
         |LIMIT 30""".stripMargin),
    OpDef("text_quality", textQuality _,
      s"""WITH base AS (
         |  SELECT doc_id, ${normalizeTextSql("text")} AS norm,
         |    ${tokensSql("text")} AS w
         |  FROM documents
         |)
         |SELECT doc_id,
         |  ${roundHalfUpSql("1.0 * len(regexp_replace(norm, '[^a-z]', '', 'g')) / NULLIF(len(norm), 0)", 6)} AS alpha_ratio,
         |  ${roundHalfUpSql("1.0 * len(regexp_replace(norm, '[^0-9]', '', 'g')) / NULLIF(len(norm), 0)", 6)} AS digit_ratio,
         |  ${roundHalfUpSql(s"1.0 * len(list_filter(w, t -> ${inListSql("t", En)})) / NULLIF(len(w), 0)", 6)} AS stopword_ratio,
         |  (len(w) >= 5 AND
         |   len(regexp_replace(norm, '[^a-z]', '', 'g')) * 10 >= len(norm) * 6) AS keep
         |FROM base
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_gopher_rules", textGopherRules _,
      s"""WITH ${gopherCtes("g")}
         |SELECT doc_id, n_words, mean_word_len, frac_unique_words,
         |  stop_hits,
         |  $gopherKeepSql AS keep
         |FROM gm
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_tokens_bpe", textTokensBpe _,
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS ws,
         |    regexp_extract_all(text, '$BpeIshPattern') AS bpe
         |  FROM documents
         |)
         |SELECT doc_id,
         |  len(ws) AS n_ws_tokens,
         |  len(bpe) AS n_bpe_tokens,
         |  ${roundHalfUpSql("1.0 * len(bpe) / NULLIF(len(ws), 0)", 6)} AS bpe_per_ws
         |FROM toks
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_langid", textLangid _,
      s"""WITH toks AS (
         |  SELECT doc_id, lang, unnest(${tokensSql("text")}) AS w
         |  FROM documents
         |),
         |hits AS (
         |  SELECT doc_id, lang,
         |    CAST(SUM(CASE WHEN ${inListSql("w", En)} THEN 1 ELSE 0 END) AS BIGINT) AS en_hits,
         |    CAST(SUM(CASE WHEN ${inListSql("w", De)} THEN 1 ELSE 0 END) AS BIGINT) AS de_hits,
         |    CAST(SUM(CASE WHEN ${inListSql("w", Fr)} THEN 1 ELSE 0 END) AS BIGINT) AS fr_hits,
         |    CAST(SUM(CASE WHEN ${inListSql("w", Es)} THEN 1 ELSE 0 END) AS BIGINT) AS es_hits
         |  FROM toks GROUP BY doc_id, lang
         |)
         |SELECT doc_id, lang,
         |  CASE
         |    WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
         |    WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
         |    WHEN fr_hits >= es_hits THEN 'fr'
         |    ELSE 'es'
         |  END AS pred_lang,
         |  en_hits, de_hits, fr_hits, es_hits
         |FROM hits
         |ORDER BY doc_id""".stripMargin),
    OpDef("text_langid_ngram", textLangidNgram _, {
      def hits(ws: Seq[String], as: String) =
        s"CAST(SUM(CASE WHEN ${inListSql("g", ws)} THEN 1 ELSE 0 END) AS BIGINT) AS $as"
      s"""WITH base AS (
         |  SELECT doc_id, lang, ${normalizeTextSql("text")} AS norm FROM documents
         |),
         |tri AS (
         |  SELECT doc_id, lang,
         |    unnest([norm[i:i+2] for i in range(1, len(norm) - 1)]) AS g
         |  FROM base WHERE len(norm) >= 3
         |),
         |hits AS (
         |  SELECT doc_id, lang,
         |    ${hits(EnTri, "en_hits")},
         |    ${hits(DeTri, "de_hits")},
         |    ${hits(FrTri, "fr_hits")},
         |    ${hits(EsTri, "es_hits")}
         |  FROM tri GROUP BY doc_id, lang
         |)
         |SELECT doc_id, lang,
         |  CASE
         |    WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
         |    WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
         |    WHEN fr_hits >= es_hits THEN 'fr'
         |    ELSE 'es'
         |  END AS pred_lang,
         |  en_hits, de_hits, fr_hits, es_hits
         |FROM hits
         |ORDER BY doc_id""".stripMargin
    }),
    OpDef("text_fingerprint", textFingerprint _,
      s"""WITH base AS (
         |  SELECT doc_id, ${normalizeTextSql("text")} AS norm FROM documents
         |),
         |grams AS (
         |  SELECT doc_id, unnest([norm[i:i+7] for i in range(1, len(norm) - 6)]) AS g
         |  FROM base WHERE len(norm) >= 8
         |)
         |SELECT doc_id,
         |  MIN(${hash60Sql("g")}) AS fingerprint,
         |  COUNT(DISTINCT ${hash60Sql("g")}) AS n_grams
         |FROM grams
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin)
  )
}
