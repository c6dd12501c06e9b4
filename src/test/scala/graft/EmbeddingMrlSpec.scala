package graft

import org.apache.spark.sql.DataFrame

/** `embedding_mrl` (Matryoshka truncation-recall report): the m = 64
  * row must anchor at recall exactly 1, every budget's recall must be
  * a valid fraction over the same query set, and a planted late-dim
  * divergence must actually cost recall at the smallest budget while a
  * prefix-complete corpus must not.
  */
class EmbeddingMrlSpec extends SparkSpecBase {

  private def frame(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def mrl(rows: Seq[(Long, Array[Float])]) =
    ops.Similarity.mrlOf(spark, ops.Similarity.normalize(spark, frame(rows)))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap

  test("on testdata: m=64 anchors at recall 1, all budgets well-formed") {
    val rows = SparkEntry.queries("embedding_mrl")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(rows.keySet === Set(8, 16, 32, 64))
    val (nq64, ov64, rec64) = rows(64)
    assert(ov64 === 3 * nq64 && rec64 === 1.0)
    rows.values.foreach { case (nq, ov, rec) =>
      assert(nq === nq64, "every budget scores the same query set")
      assert(ov >= 0 && ov <= 3 * nq)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("tail-zero corpus: truncation is lossless at every budget") {
    // all information lives in the first 8 dims; dims 8..63 are zero,
    // so every prefix >= 8 ranks identically to the full vector
    val rows = (0L until 1L).map(i => (i, oneHot(0, 1f))) ++
      Seq(20L -> mix(0, 0.9f, 1, 0.1f), 21L -> mix(0, 0.6f, 2, 0.4f),
        22L -> mix(0, 0.3f, 3, 0.7f), 23L -> oneHot(4, 1f),
        24L -> oneHot(5, 1f))
    val got = mrl(rows)
    Seq(8, 16, 32, 64).foreach { m =>
      assert(got(m)._3 === 1.0, s"m=$m should be lossless")
    }
  }

  test("planted late-dim divergence costs recall at m=8 only") {
    // query 0: head e0, strong positive tail. Candidate 20 matches the
    // head EXACTLY but carries the opposite tail -> truncated rank 1 at
    // m=8, sunk at m=64. Candidates 21-23 share the query's tail with
    // progressively weaker heads -> the true full-width top-3.
    def tailed(head: (Int, Float), tail: Float): Array[Float] = {
      val v = Array.fill(64)(tail)
      (0 until 8).foreach(j => v(j) = 0f)
      v(head._1) = head._2
      v
    }
    val rows = Seq(
      0L -> tailed((0, 1f), 0.5f),
      20L -> tailed((0, 1f), -0.5f),
      21L -> tailed((1, 0.9f), 0.5f),
      22L -> tailed((2, 0.8f), 0.5f),
      23L -> tailed((3, 0.7f), 0.5f),
      24L -> tailed((4, -1f), -0.5f))
    val got = mrl(rows)
    assert(got(64)._3 === 1.0)
    assert(got(8)._2 < got(64)._2,
      s"m=8 overlap ${got(8)._2} should lose the tail-divergent candidate")
  }

  private def oneHot(j: Int, x: Float): Array[Float] = {
    val v = new Array[Float](64); v(j) = x; v
  }

  private def mix(j1: Int, x1: Float, j2: Int, x2: Float): Array[Float] = {
    val v = new Array[Float](64); v(j1) = x1; v(j2) = x2; v
  }
}
