package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The LSH band-join skew guard is enforced behavior, not a comment:
  * buckets wider than the cap are excluded from candidate generation,
  * so a boilerplate cluster cannot turn the bucket join quadratic.
  */
class DedupSkewSpec extends SparkSpecBase {

  private def docsFrame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(docs: org.apache.spark.sql.DataFrame, cap: Int) =
    ops.Dedup.lshPairs(spark, docs, d => d
      .withColumn("norm", TextFns.normalizeText(col("text")))
      .withColumn("grams", TextFns.charNgrams("norm", 4))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), col("grams")), 0.7, maxBucket = cap)

  private val boiler = "identical boilerplate header shared by the whole cluster"
  private val rare = "a genuinely rare document that appears exactly twice here"

  test("over-wide buckets are dropped; narrow buckets still pair") {
    val docs = docsFrame(
      (0L until 40L).map(i => i -> boiler) ++ Seq(100L -> rare, 101L -> rare))
    val got = pairs(docs, cap = 16).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the 40-doc cluster (bucket width 40 > 16) contributes no pairs;
    // the width-2 bucket survives
    assert(got === Seq((100L, 101L)))
  }

  test("with a high cap the cluster pairs fully") {
    val docs = docsFrame(
      (0L until 10L).map(i => i -> boiler) ++ Seq(100L -> rare, 101L -> rare))
    val n = pairs(docs, cap = 4096).count()
    assert(n === 10L * 9 / 2 + 1)
  }

  test("incremental candidates honor the width cap across the batch split") {
    import spark.implicits._
    // batch membership is a pure hash of doc_id — recompute it here to
    // pick one new-batch and one existing id for the surviving pair
    val flags = (0L until 200L).toDF("doc_id")
      .select(col("doc_id"), (TextFns.hash60(concat(lit("inc:"), col("doc_id"))) % 10 === 0).as("n"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val newId = (100L until 200L).find(flags).get
    val oldId = (100L until 200L).find(i => !flags(i)).get
    // the boilerplate cluster must span both batches for the cap to matter
    assert((0L until 40L).exists(flags) && (0L until 40L).exists(i => !flags(i)))
    val docs = docsFrame(
      (0L until 40L).map(i => i -> boiler) ++ Seq(newId -> rare, oldId -> rare))
    val got = ops.Dedup.lshPairs(spark, docs, d => d
        .withColumn("norm", TextFns.normalizeText(col("text")))
        .withColumn("grams", TextFns.charNgrams("norm", 4))
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), col("grams")), 0.7, maxBucket = 16,
        candidatesOf = ops.Dedup.incrementalCandidates)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the 40-doc cluster exceeds the cap (counted over BOTH batches) →
    // no cross-batch pairs from it; the width-2 cross-batch pair
    // survives, oriented (new, old)
    assert(got === Seq((newId, oldId)))
  }

  test("levenshtein blocking: typo pairs found, over-wide buckets dropped, k bound holds") {
    // one substitution → pairs with base (two segments still align).
    // threeTypos touches ALL three segments vs base → no shared aligned
    // segment, no candidate (the pigeonhole contract) — but it still
    // pairs with oneTypo (they share the 'fax' segment, distance 2)
    val base = "the quick brown fox jumps over the lazy dog now"
    val oneTypo = "the quick brown fax jumps over the lazy dog now"
    val threeTypos = "the quack brown fax jumps ower the lazy dog now"
    val far = "completely different text with nothing in common here"
    val docs = docsFrame(Seq(1L -> base, 2L -> oneTypo, 3L -> threeTypos, 4L -> far))
    val got = ops.Dedup.dedupLevenshteinOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 3L, 2L)))

    // a bucket wider than the cap contributes NO candidates: 5 copies
    // of the same text exceed maxBucket=4 in every segment bucket
    val wide = docsFrame((1L to 5L).map(i => i -> base))
    assert(ops.Dedup.dedupLevenshteinOf(wide, maxBucket = 4).count() === 0)
    // at cap 5 the same clique yields all C(5,2)=10 distance-0 pairs
    assert(ops.Dedup.dedupLevenshteinOf(wide, maxBucket = 5).count() === 10)
  }

  test("broadcast gate fallback (shuffled semi-join) is result-identical") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    def run(limit: Long) = ops.Dedup.lshPairs(spark, docs, d => d
        .withColumn("norm", TextFns.normalizeText(col("text")))
        .withColumn("grams", TextFns.charNgrams("norm", 4))
        .filter(size(col("grams")) > 0)
        .select(col("doc_id"), col("grams")), 0.7, broadcastLimit = limit)
      .collect().map(_.toSeq).toSeq
    // limit 0 forces the shuffled path that a dense candidate graph
    // takes at scale; it must produce byte-identical pairs and scores
    assert(run(0L) === run(Long.MaxValue))
    spark.catalog.clearCache()
  }
}
