package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.WordPieceOps

/** WordPiece (`wordpiece_vocab` / `text_tokens_wordpiece`): the greedy
  * longest-match-first semantics — including the commit behavior that
  * distinguishes it from the unigram Viterbi — plus the `[UNK]` rules
  * and corpus-level coverage invariants.
  */
class WordPieceSpec extends SparkSpecBase {

  private def vocab(ps: String*): GenericArrayData =
    new GenericArrayData(
      ps.map(UTF8String.fromString).sortBy(identity).toArray[Any])

  private def seg(w: String, ps: String*): Seq[String] = {
    val r = WordPieceOps.seg(UTF8String.fromString(w), vocab(ps: _*))
    if (r == null) null
    else (0 until r.numElements()).map(r.getUTF8String(_).toString)
  }

  test("greedy takes the longest local match") {
    assert(seg("abcd", "a", "ab", "abc", "##b", "##c", "##d", "##cd")
      === Seq("abc", "##d"))
  }

  test("greedy COMMITS: longest-first can fail where Viterbi would not") {
    // "abc" matches at pos 0 but leaves "d" uncoverable; the shorter
    // split ab + ##cd exists. WordPiece never backtracks -> [UNK].
    assert(seg("abcd", "ab", "abc", "##cd") === null)
  }

  test("continuation pieces require the ## form") {
    // "b" is in the vocab only in initial form, so pos 1 cannot use it
    assert(seg("ab", "a", "b") === null)
    assert(seg("ab", "a", "##b") === Seq("a", "##b"))
  }

  test("UNK rules: over-length word is null, empty word is empty") {
    val long = "x" * (WordPieceOps.MaxWord + 1)
    assert(seg(long, "x", "##x") === null)
    assert(seg("", "x") === Seq.empty)
    val max = "x" * WordPieceOps.MaxWord
    assert(seg(max, "x", "##x") ===
      "x" +: Seq.fill(WordPieceOps.MaxWord - 1)("##x"))
  }

  test("vocab keeps every effective-length-1 piece (coverage floor)") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd ab"), (2L, "zzz b")).toDF("doc_id", "text")
    val voc = ops.TextAnalysis.wordpieceVocab(spark, docs)
      .select($"piece").collect().map(_.getString(0)).toSet
    // initial singles of all words + continuation singles of all
    // word-internal chars
    assert(Set("a", "c", "z", "b", "##b", "##d", "##z").subsetOf(voc))
    // frequent multi-char pieces survive too
    assert(voc.contains("ab") && voc.contains("##zz"))
  }

  test("on testdata, [UNK] counts exactly the over-length words") {
    import spark.implicits._
    val got = SparkEntry.queries("text_tokens_wordpiece")(spark, sf)
    val unk = got.agg(sum($"n_unk_words")).head.getLong(0)
    val expected = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens($"text")).as("w"))
      .filter(length($"w") > WordPieceOps.MaxWord).count()
    assert(unk === expected)
    // and wordpiece never produces fewer pieces than words (each word
    // is >= 1 token), nor more pieces than chars
    val bad = got.filter($"n_tokens_wordpiece" < $"n_words" ||
      $"n_tokens_wordpiece" > $"n_chars" + $"n_unk_words").count()
    assert(bad === 0L)
  }
}
