package graft

import org.apache.spark.sql.functions._

/** Pins `text_gopher_rules`: every emitted measure reconciles with a
  * from-scratch recompute over the raw text, the keep verdict is
  * exactly the conjunction of the four rules, and the rule battery
  * actually discriminates on real data (both verdicts occur).
  */
class GopherRulesSpec extends SparkSpecBase {

  test("measures reconcile with a raw-text recompute and keep is the rule conjunction") {
    import spark.implicits._
    val out = SparkEntry.queries("text_gopher_rules")(spark, sf).cache()
    val raw = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.TextFns.normalizeText($"text").as("norm"),
        graft.functions.TextFns.tokens($"text").as("w"))
    // single-space invariant: n_words * mean_word_len must rebuild
    // len(norm) - n_words + 1 (both sides 6-dp quantized, so compare
    // the unrounded identity on the raw side)
    val j = out.join(raw, "doc_id").cache()
    assert(j.filter(size($"w") =!= $"n_words").count() === 0)
    assert(j.filter(abs($"mean_word_len" -
      (lit(1.0) * (length($"norm") - size($"w") + 1) /
        size($"w"))) > 1e-6).count() === 0)
    assert(j.filter(abs($"frac_unique_words" -
      (lit(1.0) * size(array_distinct($"w")) / size($"w"))) > 1e-6)
      .count() === 0)
    assert(j.filter($"keep" =!=
      ($"n_words".between(50L, 100000L) &&
        $"mean_word_len".between(3.0, 10.0) &&
        $"frac_unique_words" >= 0.4 && $"stop_hits" >= 1L))
      .count() === 0)
    j.unpersist(); out.unpersist()
  }

  test("the battery discriminates: both verdicts occur on real data") {
    val out = SparkEntry.queries("text_gopher_rules")(spark, sf).cache()
    assert(out.filter(col("keep")).count() > 0, "no document kept")
    assert(out.filter(!col("keep")).count() > 0, "no document dropped")
    out.unpersist()
  }
}
