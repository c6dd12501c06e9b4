package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.GraftFunctions
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Corpus-curation operators — the pipeline stages between raw
  * text and training batches that SURVEY's text family did not yet
  * cover: chunking documents into model-window pieces, checking the
  * corpus for benchmark contamination, and scrubbing PII-shaped spans.
  *
  * Scale design:
  *  - `text_chunk` is scan + per-row explode of START OFFSETS only
  *    (the token array is sliced per chunk, never shuffled); output
  *    carries a 60-bit chunk hash, not the chunk text, so the shuffle
  *    and sink stay narrow.
  *  - `text_contamination` broadcasts the BENCHMARK side (eval sets
  *    are small by construction — here the `doc_id < 20` probe set);
  *    the corpus is touched by one scan whose exploded grams hash-join
  *    against the broadcast probe grams, so nothing corpus-sized ever
  *    shuffles. This is the standard decontamination shape: ship the
  *    benchmark to the data, never the reverse.
  *  - `text_pii_scrub` is pure row-local regex work (codegen'd), zero
  *    shuffle; patterns use plain character-class regex that means the
  *    same thing to Java regex and DuckDB's RE2.
  */
object Corpus {

  // Model-window chunking: 32-token windows every 24 tokens (8-token
  // overlap) — small enough that the synthetic docs produce several
  // chunks each.
  private val ChunkLen = 32
  private val ChunkStride = 24

  /** Overlapping token-window chunks per document: (chunk_id,
    * start_token, n_tokens, chunk_hash). The hash identifies chunk
    * content for downstream exact dedup at chunk granularity. Shared
    * by [[textChunk]] and [[chunkDedup]]. */
  private def chunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"source", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id", $"source", $"w",
        explode(expr(s"sequence(0, size(w) - 1, $ChunkStride)")).as("start"))
      .select($"doc_id", $"source",
        expr(s"CAST(start div $ChunkStride AS BIGINT)").as("chunk_id"),
        $"start".cast("long").as("start_token"),
        expr(s"slice(w, start + 1, $ChunkLen)").as("cw"))
      .select($"doc_id", $"source", $"chunk_id", $"start_token",
        size($"cw").cast("long").as("n_tokens"),
        hash60(concat_ws(" ", $"cw")).as("chunk_hash"))
  }

  private def textChunk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    chunks(s, d)
      .select($"doc_id", $"chunk_id", $"start_token", $"n_tokens", $"chunk_hash")
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Chunk-granularity exact dedup (the boilerplate detector): chunks
    * whose content hash appears in ≥ 2 distinct documents, with copy /
    * document counts and the first (min-doc_id) holder. This is the
    * sub-document twin of `dedup_exact` — headers, footers and license
    * blocks that survive document-level dedup surface here. One
    * shuffle on chunk_hash with map-side partial aggregation; nothing
    * document-sized moves (the chunk text stays behind — only its
    * 60-bit hash shuffles). */
  private def chunkDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    chunks(s, d)
      .groupBy($"chunk_hash")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct($"doc_id").as("n_docs"),
        min($"doc_id").as("first_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"chunk_hash")
  }

  // Training-sequence length for contiguous packing (model-window
  // tokens per packed sequence).
  private val SeqLen = 256

  /** Sequence packing: assign every chunk to a fixed-[[SeqLen]]-token
    * training sequence by its START OFFSET in the concatenated token
    * stream, streamed per source in (doc_id, chunk_id) order — the
    * standard contiguous pack (chunks straddling a boundary are split
    * downstream at materialization; assignment is by start offset).
    * One shuffle on `source` plus an in-partition ordered window; the
    * running sum is the only sequential state, so each source packs
    * independently and in parallel. At 100 TB a single giant source
    * key needs a second split key (e.g. crawl date) exactly like the
    * salted-aggregation pattern — noted here, not needed at testdata
    * skew. */
  private def corpusPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id".asc, $"chunk_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    chunks(s, d)
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"source", $"doc_id", $"chunk_id", $"n_tokens",
        expr(s"(cum - n_tokens) div $SeqLen").as("seq_id"),
        ($"cum" - $"n_tokens").as("seq_offset"))
      .orderBy($"source", $"doc_id", $"chunk_id")
  }

  // Gopher-style repetition thresholds: drop documents whose word
  // 2-gram / 3-gram duplicate fractions exceed these.
  private val Dup2Max = 0.30
  private val Dup3Max = 0.20

  /** Fraction of grams that are repeats of an earlier gram in the same
    * document, rounded half-up to 6dp on both engines. The `1.0 *`
    * multiplicand is a DOUBLE on both sides so the arithmetic is
    * IEEE-identical (see [[RefSql]]'s dialect notes). */
  private def dupFrac(g: Column): Column =
    roundHalfUp(when(size(g) > 0,
      lit(1.0) - lit(1.0) * size(array_distinct(g)) / size(g))
      .otherwise(lit(0.0)), 6)

  /** Repetition-based quality signals (the Gopher/MassiveText rules'
    * shape): per document, the duplicate fraction of word 2-grams and
    * 3-grams plus a keep flag — heavily templated or looping text
    * scores high and is dropped. Computed entirely row-local from the
    * token array (codegen'd shingles + array_distinct): zero shuffle,
    * a pure map stage at 100 TB. */
  private def textRepetition(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .withColumn("g2", wordShingles("w", 2))
      .withColumn("g3", wordShingles("w", 3))
      .select($"doc_id", size($"w").cast("long").as("n_tokens"),
        dupFrac($"g2").as("dup_2gram_frac"),
        dupFrac($"g3").as("dup_3gram_frac"))
      .withColumn("keep",
        $"dup_2gram_frac" <= Dup2Max && $"dup_3gram_frac" <= Dup3Max)
      .orderBy($"doc_id")
  }

  // Shard fan-out for the manifest op. 64 here; a production run sizes
  // shards to a target byte count (shards ≈ corpus / target) — the
  // assignment expression is the same at any count.
  private val NShards = 64

  private lazy val shardTmp: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_shards_")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Deterministic shard assignment + per-shard MANIFEST — the write
    * side of a training-data pipeline: the curated corpus is hash-
    * assigned to [[NShards]] shards (`hash60('shard:' || doc_id) %
    * N` — reproducible across runs and engines, balanced in
    * expectation), physically WRITTEN as a shard-partitioned parquet
    * sink, then the manifest is computed from the FILES READ BACK —
    * doc count, token count, byte count, an order-independent XOR
    * content digest, and the doc-id range per shard. The digest is
    * what lets a trainer verify shard integrity without re-reading
    * text order-sensitively (XOR commutes, so any partition order
    * yields the same digest); the token counts are what epoch
    * planning consumes. Writing then reading back proves the sink
    * round-trip, not just the assignment math ([[Sources]]'
    * `sink_partitioned` convention).
    *
    * Scale: assignment is row-local; the write is one shuffle-free
    * partitioned sink (each task appends to its shards); the manifest
    * is one map-side-combinable aggregate onto [[NShards]] rows. */
  private def corpusShardManifest(s: SparkSession, d: String) = {
    import s.implicits._
    val path = s"$shardTmp/corpus_shards"
    Tables.documents(s, d)
      .withColumn("shard_id",
        (hash60(concat(lit("shard:"), $"doc_id".cast("string"))) % NShards)
          .cast("int"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard_id").parquet(path)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT, shard_id INT")
      .parquet(path)
      .withColumn("w", tokens($"text"))
      .withColumn("th", hash60($"text"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(size($"w")).cast("long").as("n_tokens"),
        sum(octet_length($"text")).cast("long").as("n_bytes"),
        expr("bit_xor(th)").as("digest"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"shard_id")
  }

  // Contamination probe set: the first 20 documents stand in for a
  // held-out benchmark; 5-word shingles are the overlap unit.
  // graft-wide so the STREAMING twin (`stream_contamination`,
  // graft.streaming.EventStream.contaminationMatches) applies the
  // same rule in-flight.
  private[graft] val ProbeMaxId = 20
  private[graft] val ContamMinOverlap = 3

  /** Distinct 5-word-shingle fingerprints `(doc_id, gh)` of a
    * documents frame — the contamination overlap unit, shared verbatim
    * by the batch op and the streaming twin (row-local: tokenize,
    * shingle, de-dup within the row, hash — safe on a stream). Caller
    * runs `GraftFunctions.ensure`. */
  private[graft] def contaminationGrams(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("w", tokens($"text"))
      .withColumn("g", wordShingles("w", 5))
      .filter(size($"g") > 0)
      .select($"doc_id", explode(array_distinct($"g")).as("gram"))
      .select($"doc_id", hash60($"gram").as("gh"))
  }

  /** Contamination oracle SQL — shared by the batch op and (verbatim)
    * the streaming gate `stream_contamination`, whose drained
    * complete-mode sink equals the batch result exactly. */
  private[ops] def contaminationOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS w FROM documents
       |),
       |grams AS (
       |  SELECT doc_id,
       |    list_distinct([array_to_string(w[i:i+4], ' ') for i in range(1, len(w) - 3)]) AS gs
       |  FROM toks WHERE len(w) >= 5
       |),
       |gx AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
       |ghx AS (SELECT doc_id, ${hash60Sql("gram")} AS gh FROM gx),
       |probe AS (SELECT doc_id AS probe_id, gh FROM ghx WHERE doc_id < $ProbeMaxId),
       |corpus AS (SELECT doc_id, gh FROM ghx WHERE doc_id >= $ProbeMaxId),
       |sizes AS (SELECT probe_id, COUNT(*) AS n_probe FROM probe GROUP BY probe_id),
       |ov AS (
       |  SELECT c.doc_id, p.probe_id, COUNT(*) AS overlap
       |  FROM corpus c JOIN probe p ON c.gh = p.gh
       |  GROUP BY c.doc_id, p.probe_id
       |)
       |SELECT o.doc_id, o.probe_id, o.overlap,
       |  ${roundHalfUpSql("1.0 * o.overlap / s.n_probe", 6)} AS containment
       |FROM ov o JOIN sizes s ON s.probe_id = o.probe_id
       |WHERE o.overlap >= $ContamMinOverlap
       |ORDER BY o.doc_id, o.probe_id""".stripMargin

  /** Benchmark-contamination check: corpus documents sharing ≥
    * [[ContamMinOverlap]] distinct 5-word shingles with any probe
    * document, with the containment ratio (overlap / probe gram
    * count). Probe grams are BROADCAST — the corpus never shuffles. */
  private def textContamination(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    def gramSet(df: DataFrame): DataFrame = contaminationGrams(df)
    val docs = Tables.documents(s, d)
    val probe = gramSet(docs.filter($"doc_id" < ProbeMaxId))
      .select($"doc_id".as("probe_id"), $"gh")
    val probeSizes = probe.groupBy($"probe_id")
      .agg(count(lit(1)).as("n_probe"))
    gramSet(docs.filter($"doc_id" >= ProbeMaxId))
      .join(broadcast(probe), "gh")
      .groupBy($"doc_id", $"probe_id")
      .agg(count(lit(1)).as("overlap"))
      .filter($"overlap" >= ContamMinOverlap)
      .join(broadcast(probeSizes), "probe_id")
      .select($"doc_id", $"probe_id", $"overlap",
        roundHalfUp(lit(1.0) * $"overlap" / $"n_probe", 6).as("containment"))
      .orderBy($"doc_id", $"probe_id")
  }

  // PII-shaped spans: email addresses, NN-NNN-NNN-NNNN phone numbers,
  // IBAN-shaped account ids (2 letters + 22 digits), and money/decimal
  // amounts. Plain character classes and bounded repetition only —
  // identical semantics in Java regex and RE2.
  private val EmailPat = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z][a-z]+"
  private val PhonePat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val IbanPat = "[A-Z][A-Z][0-9]{20}"
  private val AmountPat = "[0-9]+\\.[0-9]+"

  /** PII scrubbing over support-note text synthesized deterministically
    * from customer fields (the testdata carries no real PII, so the
    * note plants the shapes): email → `<EMAIL>`, phone → `<PHONE>`,
    * IBAN → `<IBAN>`, amount → `<AMT>`, with a per-kind match count
    * and a changed flag. Phone and IBAN spans are present only for a
    * custkey-dependent subset, so the counts are non-constant and the
    * zero case is exercised. Replacement order (email, IBAN, phone,
    * amount) is fixed and mirrored in the oracle; counts are taken on
    * the pre-redaction note. Row-local codegen'd regex work — zero
    * shuffle, a pure map stage at 100 TB. */
  private def piiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val phone = concat((lit(10) + $"c_nationkey").cast("string"), lit("-"),
      lpad(($"c_custkey" % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((($"c_custkey" * 7) % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((($"c_custkey" * 31) % 10000).cast("string"), 4, "0"))
    val iban = concat(lit("DE"),
      lpad((($"c_custkey" * 9973) % 97).cast("string"), 2, "0"),
      lpad($"c_custkey".cast("string"), 18, "0"))
    Tables.customer(s, d)
      .withColumn("note", concat(
        $"c_name", lit(" <user"), $"c_custkey".cast("string"),
        lit("@example.com>"),
        when($"c_custkey" % 3 =!= 0, concat(lit(" phone "), phone))
          .otherwise(lit("")),
        when($"c_custkey" % 5 =!= 2, concat(lit(" iban "), iban))
          .otherwise(lit("")),
        lit(" (segment "), $"c_mktsegment", lit(") balance "),
        $"c_acctbal".cast("decimal(12,2)").cast("string"),
        lit(" nation "), $"c_nationkey".cast("string")))
      .select($"c_custkey",
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          $"note", EmailPat, "<EMAIL>"), IbanPat, "<IBAN>"),
          PhonePat, "<PHONE>"), AmountPat, "<AMT>").as("scrubbed"),
        regexp_count($"note", lit(EmailPat)).cast("long").as("n_email"),
        regexp_count($"note", lit(PhonePat)).cast("long").as("n_phone"),
        regexp_count($"note", lit(IbanPat)).cast("long").as("n_iban"),
        regexp_count($"note", lit(AmountPat)).cast("long").as("n_amount"))
      .withColumn("changed",
        $"n_email" + $"n_phone" + $"n_iban" + $"n_amount" > 0)
      .orderBy($"c_custkey")
  }

  /** Shared chunk CTE — the SQL twin of [[chunks]]. */
  private val chunkCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, ${tokensSql("text")} AS w FROM documents
       |),
       |st AS (
       |  SELECT doc_id, source, w, unnest(range(0, len(w), $ChunkStride)) AS start
       |  FROM toks WHERE len(w) > 0
       |),
       |ch AS (
       |  SELECT doc_id, source,
       |    start // $ChunkStride AS chunk_id,
       |    CAST(start AS BIGINT) AS start_token,
       |    CAST(len(w[start + 1 : start + $ChunkLen]) AS BIGINT) AS n_tokens,
       |    ${hash60Sql(s"array_to_string(w[start + 1 : start + $ChunkLen], ' ')")} AS chunk_hash
       |  FROM st
       |)""".stripMargin

  // Boilerplate-removal geometry: contiguous non-overlapping token
  // blocks (stride = width, unlike the model-window [[chunks]] whose
  // overlap would make reassembly ambiguous) and the cross-document
  // frequency at which a block counts as boilerplate.
  private val BlockLen = 32
  private val BoilerDfMin = 2

  /** Boilerplate removal — the sub-document rewrite `chunk_dedup` only
    * DETECTS: split each doc into contiguous [[BlockLen]]-token
    * blocks, drop every block whose content appears in ≥
    * [[BoilerDfMin]] distinct documents (headers, footers, license
    * text), and reassemble the survivors in order. Emits per-doc
    * counts and the md5 of the cleaned text (compact + verifiable;
    * the cleaned text itself would just echo the corpus).
    *
    * Scale: block split is row-local; the document-frequency pass is
    * one map-side-combined aggregate on the 60-bit block hash (no
    * block text shuffles); the keep/drop join is a hash join on the
    * same key; reassembly shuffles each doc's KEPT block texts once,
    * grouped by doc_id — the unavoidable rewrite cost, bounded by
    * output size. In-doc order is restored with an `array_sort` over
    * (start, text) structs, so reassembly is deterministic under any
    * partitioning. */
  private def textBoilerplate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blocks = Tables.documents(s, d)
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") > 0)
      .select($"doc_id",
        explode(expr(s"sequence(0, size(w) - 1, $BlockLen)")).as("start"),
        $"w")
      .select($"doc_id", $"start".cast("long").as("start"),
        concat_ws(" ", expr(s"slice(w, start + 1, $BlockLen)")).as("btext"))
      .withColumn("bh", hash60($"btext"))
      // two consumers (df aggregate + join probe): cache so the
      // tokenize+sequence-explode+slice+hash lineage runs once
      // (harness clears caches between queries)
      .cache()
    val df = blocks.groupBy($"bh")
      .agg(countDistinct($"doc_id").as("bdf"))
    blocks.join(df, "bh")
      .withColumn("keep", $"bdf" < BoilerDfMin)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when($"keep", 0L).otherwise(1L)).as("n_dropped"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(start, btext) END)), x -> x.btext)")))
          .as("clean_hash"))
      .orderBy($"doc_id")
  }

  private def boilerplateOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${tokensSql("text")} AS w FROM documents
       |),
       |st AS (
       |  SELECT doc_id, w, unnest(range(0, len(w), $BlockLen)) AS start
       |  FROM toks WHERE len(w) > 0
       |),
       |blocks AS (
       |  SELECT doc_id, CAST(start AS BIGINT) AS start,
       |    array_to_string(w[start + 1 : start + $BlockLen], ' ') AS btext
       |  FROM st
       |),
       |hashed AS (
       |  SELECT doc_id, start, btext, ${hash60Sql("btext")} AS bh FROM blocks
       |),
       |dfreq AS (
       |  SELECT bh, COUNT(DISTINCT doc_id) AS bdf FROM hashed GROUP BY bh
       |)
       |SELECT h.doc_id, COUNT(*) AS n_blocks,
       |  CAST(SUM(CASE WHEN d.bdf < $BoilerDfMin THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_dropped,
       |  md5(COALESCE(string_agg(h.btext, ' ' ORDER BY h.start)
       |    FILTER (WHERE d.bdf < $BoilerDfMin), '')) AS clean_hash
       |FROM hashed h JOIN dfreq d ON d.bh = h.bh
       |GROUP BY h.doc_id
       |ORDER BY h.doc_id""".stripMargin

  // Source-overlap knob: per-source signature vocabulary size.
  private val OvTopK = 100

  /** Inter-source vocabulary overlap — the corpus-composition
    * diagnostic behind mixing decisions: for every source pair, the
    * Jaccard overlap of their top-[[OvTopK]] term vocabularies (high
    * overlap ⇒ the sources are near-redundant and capping one starves
    * nothing; low ⇒ each contributes distinct coverage).
    *
    * Scale: term counts are one map-side-combined (source, term)
    * shuffle; each source collapses to a ≤ [[OvTopK]]-term signature
    * via a per-source WindowGroupLimit rank (count DESC, term ASC tie
    * break — deterministic in both engines); the pairwise stage joins
    * SIGNATURE rows only (≤ sources × [[OvTopK]]), never corpus
    * text — |sources|² pair cost on vocabulary-sized data. */
  private def corpusSourceOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, d)
      .select($"source", explode(tokens($"text")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"source")
      .orderBy($"n".desc, $"term".asc)
    val sig = counts
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= OvTopK)
      .select($"source", $"term").cache()
    val sizes = sig.groupBy($"source").agg(count(lit(1)).as("nv"))
    sig.as("a").join(sig.as("b"),
        $"a.term" === $"b.term" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(sizes.select($"source".as("source_a"), $"nv".as("na"))),
        "source_a")
      .join(broadcast(sizes.select($"source".as("source_b"), $"nv".as("nb"))),
        "source_b")
      .select($"source_a", $"source_b", $"common",
        roundHalfUp(lit(1.0) * $"common" / ($"na" + $"nb" - $"common"), 6)
          .as("jaccard"))
      .orderBy($"source_a", $"source_b")
  }

  private def sourceOverlapOracle: String =
    s"""WITH counts AS (
       |  SELECT source, unnest(${tokensSql("text")}) AS term
       |  FROM documents
       |),
       |agged AS (
       |  SELECT source, term, COUNT(*) AS n FROM counts GROUP BY source, term
       |),
       |sig AS (
       |  SELECT source, term FROM (
       |    SELECT source, term,
       |      row_number() OVER (PARTITION BY source
       |        ORDER BY n DESC, term ASC) AS rk
       |    FROM agged
       |  ) WHERE rk <= $OvTopK
       |),
       |sizes AS (SELECT source, COUNT(*) AS nv FROM sig GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common
       |  FROM sig a JOIN sig b
       |    ON a.term = b.term AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT p.source_a, p.source_b, p.common,
       |  ${roundHalfUpSql(
      "1.0 * p.common / (sa.nv + sb.nv - p.common)", 6)} AS jaccard
       |FROM pairs p
       |JOIN sizes sa ON sa.source = p.source_a
       |JOIN sizes sb ON sb.source = p.source_b
       |ORDER BY p.source_a, p.source_b""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("corpus_source_overlap", corpusSourceOverlap _, sourceOverlapOracle),
    OpDef("text_boilerplate", textBoilerplate _, boilerplateOracle),
    OpDef("text_chunk", textChunk _,
      s"""$chunkCte
         |SELECT doc_id, chunk_id, start_token, n_tokens, chunk_hash
         |FROM ch
         |ORDER BY doc_id, chunk_id""".stripMargin),
    OpDef("chunk_dedup", chunkDedup _,
      s"""$chunkCte
         |SELECT chunk_hash, COUNT(*) AS n_copies,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  MIN(doc_id) AS first_doc
         |FROM ch
         |GROUP BY chunk_hash
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin),
    OpDef("corpus_pack", corpusPack _,
      s"""$chunkCte,
         |cum AS (
         |  SELECT source, doc_id, chunk_id, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY doc_id ASC, chunk_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM ch
         |)
         |SELECT source, doc_id, chunk_id, n_tokens,
         |  (cum - n_tokens) // $SeqLen AS seq_id,
         |  cum - n_tokens AS seq_offset
         |FROM cum
         |ORDER BY source, doc_id, chunk_id""".stripMargin),
    OpDef("text_repetition", textRepetition _,
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS w FROM documents
         |),
         |g AS (
         |  SELECT doc_id, w,
         |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS g2,
         |    [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS g3
         |  FROM toks
         |),
         |fr AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |    ${roundHalfUpSql(
              "CASE WHEN len(g2) > 0 THEN 1.0 - CAST(1 AS DOUBLE) * len(list_distinct(g2)) / len(g2) ELSE CAST(0.0 AS DOUBLE) END", 6)} AS dup_2gram_frac,
         |    ${roundHalfUpSql(
              "CASE WHEN len(g3) > 0 THEN 1.0 - CAST(1 AS DOUBLE) * len(list_distinct(g3)) / len(g3) ELSE CAST(0.0 AS DOUBLE) END", 6)} AS dup_3gram_frac
         |  FROM g
         |)
         |SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac,
         |  (dup_2gram_frac <= $Dup2Max AND dup_3gram_frac <= $Dup3Max) AS keep
         |FROM fr
         |ORDER BY doc_id""".stripMargin),
    OpDef("corpus_shard_manifest", corpusShardManifest _,
      s"""SELECT CAST(${hash60Sql("'shard:' || doc_id")} % $NShards AS INT)
         |    AS shard_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(${tokensSql("text")})) AS BIGINT) AS n_tokens,
         |  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
         |  bit_xor(${hash60Sql("text")}) AS digest,
         |  MIN(doc_id) AS min_doc_id,
         |  MAX(doc_id) AS max_doc_id
         |FROM documents
         |GROUP BY 1
         |ORDER BY shard_id""".stripMargin),
    OpDef("text_contamination", textContamination _, contaminationOracle),
    OpDef("text_pii_scrub", piiScrub _,
      s"""WITH notes AS (
         |  SELECT c_custkey,
         |    c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com>'
         |      || CASE WHEN c_custkey % 3 <> 0 THEN ' phone '
         |           || CAST(10 + c_nationkey AS VARCHAR) || '-'
         |           || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
         |           || lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-'
         |           || lpad(CAST((c_custkey * 31) % 10000 AS VARCHAR), 4, '0')
         |         ELSE '' END
         |      || CASE WHEN c_custkey % 5 <> 2 THEN ' iban DE'
         |           || lpad(CAST((c_custkey * 9973) % 97 AS VARCHAR), 2, '0')
         |           || lpad(CAST(c_custkey AS VARCHAR), 18, '0')
         |         ELSE '' END
         |      || ' (segment ' || c_mktsegment || ') balance '
         |      || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
         |      || ' nation ' || CAST(c_nationkey AS VARCHAR) AS note
         |  FROM customer
         |),
         |counted AS (
         |  SELECT c_custkey,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      note, '$EmailPat', '<EMAIL>', 'g'), '$IbanPat', '<IBAN>', 'g'),
         |      '$PhonePat', '<PHONE>', 'g'), '$AmountPat', '<AMT>', 'g') AS scrubbed,
         |    CAST(len(regexp_extract_all(note, '$EmailPat')) AS BIGINT) AS n_email,
         |    CAST(len(regexp_extract_all(note, '$PhonePat')) AS BIGINT) AS n_phone,
         |    CAST(len(regexp_extract_all(note, '$IbanPat')) AS BIGINT) AS n_iban,
         |    CAST(len(regexp_extract_all(note, '$AmountPat')) AS BIGINT) AS n_amount
         |  FROM notes
         |)
         |SELECT c_custkey, scrubbed, n_email, n_phone, n_iban, n_amount,
         |  (n_email + n_phone + n_iban + n_amount > 0) AS changed
         |FROM counted
         |ORDER BY c_custkey""".stripMargin)
  )
}
