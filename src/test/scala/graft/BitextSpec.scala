package graft

import org.apache.spark.sql.functions._

/** Pins `mine_bitext` to its sibling: by construction it shares
  * `dedup_embedding`'s candidates AND threshold, so the mined set must
  * equal that op's pair set decorated with langs and restricted to
  * cross-language pairs — same-language near-dups are the dedup
  * problem, cross-language ones are the training signal.
  */
class BitextSpec extends SparkSpecBase {

  test("mined pairs = dedup_embedding pairs restricted to cross-language") {
    import spark.implicits._
    val langs = Tables.documents(spark, sf).select($"doc_id", $"lang")
    val want = SparkEntry.queries("dedup_embedding")(spark, sf)
      .join(langs.select($"doc_id".as("vec_a"), $"lang".as("lang_a")), "vec_a")
      .join(langs.select($"doc_id".as("vec_b"), $"lang".as("lang_b")), "vec_b")
      .filter($"lang_a" =!= $"lang_b")
      .select($"vec_a".as("doc_a"), $"lang_a", $"vec_b".as("doc_b"),
        $"lang_b", $"cosine")
    val got = SparkEntry.queries("mine_bitext")(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every mined pair really is cross-language and above threshold
    assert(got.filter($"lang_a" === $"lang_b").count() === 0)
    assert(got.filter($"cosine" < 0.4).count() === 0)
  }
}
