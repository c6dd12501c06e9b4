package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Pins the tokenizer round-trip contract of `bpe_decode` and
  * `text_detokenize_unigram`: every document's decoded digest equals
  * the md5 of its INDEPENDENTLY normalized token stream (computed here
  * without going through either training chain), and `roundtrip_ok`
  * is true everywhere — the training-serving-skew gate.
  */
class DetokenizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def expected = Tables.documents(spark, sf)
    .select(col("doc_id"),
      md5(array_join(TextFns.tokens(col("text")), " ")).as("want"))

  test("bpe decode(encode(x)) = normalized x on every document") {
    val out = SparkEntry.queries("bpe_decode")(spark, sf).cache()
    assert(out.filter(!col("roundtrip_ok")).count() === 0)
    assert(out.join(expected, Seq("doc_id"))
      .filter(col("decoded_digest") =!= col("want")).count() === 0,
      "decoded digest differs from the directly-normalized text")
    // decode never changes token CONTENT, only grouping: enc <= raw
    assert(out.filter(col("n_tokens_enc") > col("n_tokens_raw"))
      .count() === 0)
    out.unpersist()
  }

  test("unigram detokenize(segment(x)) = normalized x on every document") {
    val out = SparkEntry.queries("text_detokenize_unigram")(spark, sf)
      .cache()
    assert(out.filter(!col("roundtrip_ok")).count() === 0)
    assert(out.join(expected, Seq("doc_id"))
      .filter(col("decoded_digest") =!= col("want")).count() === 0)
    // word count matches the raw tokenization (segmentation is a
    // within-word operation; it can never add or drop words)
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("nw"))
    assert(out.join(words, Seq("doc_id"))
      .filter(col("n_words") =!= col("nw")).count() === 0)
    out.unpersist()
  }
}
