package graft

import org.apache.spark.sql.DataFrame

/** The embedding band-join width cap (Similarity.MaxEmbBucket) is
  * enforced behavior, mirroring DedupSkewSpec for the text pipeline: a
  * degenerate cluster of near-identical embeddings (the
  * boilerplate-image case) must not turn the band self-join quadratic.
  */
class EmbSkewSpec extends SparkSpecBase {

  /** 64-dim unit-direction vectors: a `big`-sized identical cluster
    * (every member hashes into the same (band, v) bucket in all bands)
    * plus one isolated near-dup pair pointing elsewhere. */
  private def embFrame(big: Int): DataFrame = {
    import spark.implicits._
    val cluster = (0 until big).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j < 8) 1.0f else 0.01f))
    }
    // near-identical pair, distinct direction from the cluster
    val pair = Seq(
      (1000L, Array.tabulate(64)(j => if (j >= 56) 1.0f else -0.02f)),
      (1001L, Array.tabulate(64)(j => if (j >= 56) 0.99f else -0.021f)))
    (cluster ++ pair).toDF("vec_id", "embedding")
  }

  private def candidates(df: DataFrame, cap: Int) =
    ops.Similarity.embeddingCandidates(spark,
      ops.Similarity.normalize(spark, df), cap)

  test("over-wide embedding buckets are dropped; narrow ones still pair") {
    val got = candidates(embFrame(big = 40), cap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // the 40-vector cluster exceeds the cap in every band → no pairs;
    // the width-2 bucket of the isolated near-dup pair survives
    assert(got === Seq((1000L, 1001L)))
  }

  test("with a high cap the cluster pairs fully (bounded, not lossy)") {
    val n = candidates(embFrame(big = 10), cap = 4096).count()
    assert(n === 10L * 9 / 2 + 1)
  }

  test("candidate volume is bounded by cap²-ish, not cluster²") {
    // with the default cap the degenerate cluster is excluded wholesale,
    // so candidate count is O(pairs outside the cluster), independent of
    // how big the cluster grows
    val n40 = candidates(embFrame(big = 40), cap = 16).count()
    val n80 = candidates(embFrame(big = 80), cap = 16).count()
    assert(n40 === 1 && n80 === 1)
  }
}
