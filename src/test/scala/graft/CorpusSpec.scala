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
}
