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
