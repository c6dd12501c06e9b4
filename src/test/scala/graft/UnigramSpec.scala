package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftFunctions, UnigramOps}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM tokenizer family: expression-level Viterbi pins
  * (hand-traced DP, tie-breaks, bounds), train invariants, and the
  * store-twin equivalence. */
class UnigramSpec extends SparkSpecBase {

  private def arr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def lng(xs: Seq[Long]) = new GenericArrayData(xs.toArray[Any])

  private def segOf(w: String, vocab: Seq[(String, Long)]): Seq[String] = {
    val sorted = vocab.sortBy(_._1)
    val out = UnigramOps.seg(UTF8String.fromString(w),
      arr(sorted.map(_._1)), lng(sorted.map(_._2)))
    if (out == null) null
    else (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  test("viterbi picks the higher-scoring segmentation, not greedy") {
    // 'abc': greedy longest-match takes 'ab'+'c' (score -10-9=-19);
    // viterbi must take 'a'+'bc' (score -3-4=-7)
    val v = Seq("a" -> -3L, "b" -> -5L, "c" -> -9L, "ab" -> -10L,
      "bc" -> -4L)
    assert(segOf("abc", v) === Seq("a", "bc"))
  }

  test("viterbi ties break toward the smallest split point") {
    // 'ab' via 'ab' (-8) vs 'a'+'b' (-4-4=-8): equal scores. The
    // whole-piece path has j=0 for the final piece, the split path
    // j=1 — the oracle's ORDER BY score DESC, j ASC keeps j=0.
    val v = Seq("a" -> -4L, "b" -> -4L, "ab" -> -8L)
    assert(segOf("ab", v) === Seq("ab"))
  }

  test("bounds: over-length and uncovered words are null, empty is empty") {
    val v = Seq("a" -> -1L)
    assert(segOf("a" * (UnigramOps.MaxWord + 1), v) === null)
    assert(segOf("ax", v) === null, "x is not coverable")
    assert(segOf("", v) === Seq.empty)
    assert(segOf("aaaa", v) === Seq("a", "a", "a", "a"))
  }

  test("train on the corpus: coverage floor, prune cap, negative logprobs") {
    import spark.implicits._
    val out = SparkEntry.queries("text_unigram_train")(spark, sf).cache()
    val pieces = out.select("piece").as[String].collect().toSet
    assert(pieces.size === out.count(), "pieces must be unique")
    assert(out.filter(col("logprob") >= 0).count() === 0,
      "every piece probability is < 1")
    assert(out.filter(length(col("piece")) >= 2).count() <= 80,
      "multi-char vocab must respect the prune cap")
    // coverage floor: every single character of every eligible word
    // survives in the vocabulary
    val chars = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens($"text")).as("w"))
      .filter(length($"w").between(1, UnigramOps.MaxWord))
      .select(explode(split($"w", "")).as("c"))
      .filter($"c" =!= "").distinct().as[String].collect().toSet
    assert(chars.subsetOf(pieces),
      s"missing chars: ${chars.diff(pieces).take(5)}")
    out.unpersist()
  }

  test("tokens on the corpus: char bound, word floor, store twin identical") {
    import spark.implicits._
    val live = SparkEntry.queries("text_tokens_unigram")(spark, sf).cache()
    assert(live.filter(col("n_tokens_unigram") > col("n_chars")).count() === 0,
      "a piece has at least one char")
    assert(live.filter(col("n_tokens_unigram") < col("n_words")).count() === 0,
      "a non-empty word yields at least one token")
    val store = SparkEntry.queries("text_tokens_unigram_store")(spark, sf)
    assert(live.exceptAll(store).isEmpty && store.exceptAll(live).isEmpty,
      "store-fed tokenization must equal the live path")
    live.unpersist()
  }

  test("piece store survives a parquet round trip") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val voc = ops.TextAnalysis.unigramVocab(spark, docs)
      .select($"piece", $"cnt".cast("long").as("cnt"))
    val dir = java.nio.file.Files
      .createTempDirectory("unigram_store").toString
    voc.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val a = ops.TextAnalysis.uniTokensFrom(spark, docs, voc)
    val b = ops.TextAnalysis.uniTokensFrom(spark, docs, reread)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "parquet round-tripped vocab must tokenize identically")
  }
}
