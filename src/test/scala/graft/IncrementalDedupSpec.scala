package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns.hash60

/** `dedup_incremental` must agree with the full near-dup graph: its
  * result is EXACTLY the cross-batch slice of `dedup_minhash` (same
  * shingles, threshold, and width cap), reoriented to (new, old) —
  * the incremental path may skip within-batch pairs but must not
  * invent, miss, or re-score a cross-batch pair.
  */
class IncrementalDedupSpec extends SparkSpecBase {

  private def isNew(c: org.apache.spark.sql.Column) =
    hash60(concat(lit("inc:"), c)) % 10 === 0

  test("staged-signature run equals the recompute run pair-for-pair") {
    // production shape: the existing corpus's signatures are PERSISTED
    // as parquet; an ingest signs only the new batch and joins the
    // store. Result must be identical to deriving both sides in-query.
    val docs = Tables.documents(spark, sf)
    val store = java.nio.file.Files
      .createTempDirectory("sigstore").toString
    ops.Dedup.signatureStore(spark,
        docs.filter(!ops.Dedup.isNewBatch(col("doc_id"))), ops.Dedup.wordGrams)
      .write.mode("overwrite").parquet(store)
    val staged = ops.Dedup.incrementalFromStore(spark, docs,
      d => d.filter(ops.Dedup.isNewBatch(col("doc_id"))),
      spark.read.parquet(store), ops.Dedup.wordGrams, 0.8)
    val recompute = SparkEntry.queries("dedup_incremental")(spark, sf)
    assert(staged.count() === recompute.count())
    assert(staged.except(recompute).count() === 0 &&
      recompute.except(staged).count() === 0)
  }

  test("staged run's signature pass reads only the increment") {
    // observe every frame the gram stage is applied to: the first is
    // the signing input (the second is the candidate-scoped verify
    // input). With a store present, signing must touch the new batch
    // only — never the corpus.
    val docs = Tables.documents(spark, sf)
    val newCount = docs.filter(ops.Dedup.isNewBatch(col("doc_id"))).count()
    val total = docs.count()
    assert(newCount > 0 && newCount < total / 5, s"batch slice $newCount/$total")
    var gramInputs = Vector.empty[org.apache.spark.sql.DataFrame]
    val observed: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => { gramInputs :+= d; ops.Dedup.wordGrams(d) }
    val store = ops.Dedup.signatureStore(spark,
      docs.filter(!ops.Dedup.isNewBatch(col("doc_id"))), ops.Dedup.wordGrams)
    ops.Dedup.incrementalFromStore(spark, docs,
      d => d.filter(ops.Dedup.isNewBatch(col("doc_id"))),
      store, observed, 0.8).count()
    assert(gramInputs.nonEmpty)
    assert(gramInputs.head.count() === newCount,
      s"signature pass saw ${gramInputs.head.count()} docs, increment is $newCount")
  }

  test("incremental = cross-batch subset of the full near-dup graph") {
    val full = SparkEntry.queries("dedup_minhash")(spark, sf)
      .filter(isNew(col("doc_a")) =!= isNew(col("doc_b")))
      .select(
        when(isNew(col("doc_a")), col("doc_a")).otherwise(col("doc_b")).as("doc_a"),
        when(isNew(col("doc_a")), col("doc_b")).otherwise(col("doc_a")).as("doc_b"),
        col("jaccard"))
    val inc = SparkEntry.queries("dedup_incremental")(spark, sf)
    assert(inc.count() === full.count())
    assert(inc.except(full).count() === 0 && full.except(inc).count() === 0)
  }
}
