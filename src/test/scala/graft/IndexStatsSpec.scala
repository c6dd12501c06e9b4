package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Pins the retrieval-side text statistics: the inverted index's
  * postings really point at documents containing the term (re-derived
  * from the raw corpus, independent of the operator's aggregate), and
  * the BPE pair counts equal a from-scratch recount via the
  * higher-order-function formulation the codegen'd shingle expression
  * replaced. */
class IndexStatsSpec extends SparkSpecBase {

  // postings are serialized as a comma-joined string (the harness
  // compare cannot hash array cells) — split back for the checks
  private lazy val idx =
    SparkEntry.queries("inverted_index")(spark, sf)
      .withColumn("postings",
        expr("transform(split(postings, ','), x -> cast(x AS bigint))"))
      .cache()

  private lazy val termDocs = Tables.documents(spark, sf)
    .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    .distinct().cache()

  test("inverted index: df floor, postings sorted, capped, and df-consistent") {
    import spark.implicits._
    val bad = idx.filter($"df" < 5 || size($"postings") > 8 ||
      size($"postings") === 0 ||
      (size($"postings") < 8 && $"df" =!= size($"postings")) ||
      expr("postings != array_sort(postings)"))
    assert(bad.count() === 0)
  }

  test("inverted index: every posting's document contains the term") {
    val posted = idx.select(col("term"), explode(col("postings")).as("doc_id"))
    assert(posted.join(termDocs, Seq("term", "doc_id"), "left_anti")
      .count() === 0)
    // and df equals the true distinct-document count for the term
    val trueDf = termDocs.groupBy("term").agg(count(lit(1)).as("true_df"))
    assert(idx.join(trueDf, "term")
      .filter(col("df") =!= col("true_df")).count() === 0)
  }

  test("bpe pair stats: counts match the higher-order recount") {
    import spark.implicits._
    val viaHof = Tables.documents(spark, sf)
      .select(TextFns.tokens($"text").as("w"))
      .filter(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("expected"))
    val got = SparkEntry.queries("bpe_pair_stats")(spark, sf)
    assert(got.count() === 30)
    assert(got.join(viaHof, "pair")
      .filter(col("occurrences") =!= col("expected")).count() === 0)
  }
}
