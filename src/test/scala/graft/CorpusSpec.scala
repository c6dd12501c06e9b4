package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural invariants of the corpus-curation operators — properties
  * the DuckDB oracle's value compare implies only indirectly, pinned
  * directly so a refactor cannot bend them.
  */
class CorpusSpec extends SparkSpecBase {

  test("chunks tile documents: stride-aligned starts, 1..32 tokens") {
    val ch = SparkEntry.queries("text_chunk")(spark, sf)
    assert(ch.filter(col("start_token") =!= col("chunk_id") * 24).count() === 0)
    assert(ch.filter(col("n_tokens") < 1 || col("n_tokens") > 32).count() === 0)
  }

  test("packing is gapless: offsets telescope per source, seq_id = offset div len") {
    val p = SparkEntry.queries("corpus_pack")(spark, sf)
    assert(p.filter(col("seq_id") =!= expr("seq_offset div 256")).count() === 0)
    // each chunk starts exactly where the previous one ended — the
    // concatenated-stream property the contiguous pack depends on
    val w = Window.partitionBy("source").orderBy("doc_id", "chunk_id")
    val gaps = p
      .withColumn("prev_end",
        lag(col("seq_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("seq_offset") =!= col("prev_end"))
    assert(gaps.count() === 0)
  }

  test("repetition keep flag is exactly its thresholds") {
    val r = SparkEntry.queries("text_repetition")(spark, sf)
    val bad = r.filter(col("keep") =!=
      (col("dup_2gram_frac") <= 0.30 && col("dup_3gram_frac") <= 0.20))
    assert(bad.count() === 0)
  }

  test("chunk_dedup rows are exactly the multi-document chunk hashes") {
    val ch = SparkEntry.queries("text_chunk")(spark, sf)
    val want = ch.groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).count()
    assert(SparkEntry.queries("chunk_dedup")(spark, sf).count() === want)
  }

  test("pii scrub leaves no residual PII-shaped span") {
    val p = SparkEntry.queries("text_pii_scrub")(spark, sf).cache()
    val residual = p.filter(
      col("scrubbed").rlike("[a-z0-9._]+@[a-z0-9.]+\\.[a-z][a-z]+") ||
        col("scrubbed").rlike("[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}") ||
        col("scrubbed").rlike("[A-Z][A-Z][0-9]{20}") ||
        col("scrubbed").rlike("[0-9]+\\.[0-9]+"))
    assert(residual.count() === 0)
    p.unpersist()
  }

  test("pii per-kind counts follow the planted-span schedule") {
    val p = SparkEntry.queries("text_pii_scrub")(spark, sf).cache()
    // every note plants exactly one email and one balance amount
    assert(p.filter(col("n_email") =!= 1 || col("n_amount") =!= 1).count() === 0)
    // phone is absent exactly when custkey % 3 == 0, iban when % 5 == 2
    assert(p.filter(col("n_phone") =!=
      when(col("c_custkey") % 3 === 0, 0L).otherwise(1L)).count() === 0)
    assert(p.filter(col("n_iban") =!=
      when(col("c_custkey") % 5 === 2, 0L).otherwise(1L)).count() === 0)
    // the zero cases actually occur in the testdata
    assert(p.filter(col("n_phone") === 0).count() > 0)
    assert(p.filter(col("n_iban") === 0).count() > 0)
    p.unpersist()
  }

  test("shard manifest reconciles exactly with the corpus") {
    import graft.functions.TextFns
    val out = SparkEntry.queries("corpus_shard_manifest")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.agg(sum("n_docs")).head.getLong(0) === docs.count())
    assert(out.agg(sum("n_tokens")).head.getLong(0) ===
      docs.agg(sum(size(TextFns.tokens(col("text"))))).head.getLong(0))
    assert(out.agg(sum("n_bytes")).head.getLong(0) ===
      docs.agg(sum(octet_length(col("text")))).head.getLong(0))
    // doc-id ranges stay inside the corpus id range
    val (lo, hi) = (docs.agg(min("doc_id")).head.getLong(0),
      docs.agg(max("doc_id")).head.getLong(0))
    assert(out.filter(col("min_doc_id") < lo || col("max_doc_id") > hi)
      .count() === 0)
    out.unpersist()
  }

  test("shard digest is partition-order-independent and corruption-sensitive") {
    import graft.functions.TextFns
    val out = SparkEntry.queries("corpus_shard_manifest")(spark, sf)
      .select(col("shard_id"), col("digest"))
    def digests(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("shard_id", (TextFns.hash60(
        concat(lit("shard:"), col("doc_id").cast("string"))) % 64).cast("int"))
      .withColumn("th", TextFns.hash60(col("text")))
      .groupBy("shard_id").agg(expr("bit_xor(th)").as("digest"))
    // a differently-partitioned recompute yields identical digests (XOR
    // commutes — the property that makes the manifest verifiable at all)
    val re = digests(Tables.documents(spark, sf).repartition(7))
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty)
    // flipping ONE document's text changes exactly that shard's digest
    val corrupted = digests(Tables.documents(spark, sf)
      .withColumn("text", when(col("doc_id") === 0, lit("tampered"))
        .otherwise(col("text"))))
    val changed = out.as("a").join(corrupted.as("b"), "shard_id")
      .filter(col("a.digest") =!= col("b.digest")).count()
    assert(changed === 1, s"exactly one shard digest must change, got $changed")
  }
}
