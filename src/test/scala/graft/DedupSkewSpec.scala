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
