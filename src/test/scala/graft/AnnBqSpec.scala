package graft

import org.apache.spark.sql.DataFrame

/** Binary-quantization ANN (`ann_bq`): the sign-bit pack must be the
  * exact 64-bit mask (including the sign bit — dim 63 maps to
  * `1L << 63`, the Long.MinValue bit pattern), Hamming must equal the
  * per-dimension sign-mismatch count the oracle computes, and the
  * asymmetric rerank must surface exact duplicates at rank 1 with
  * Hamming 0.
  */
class AnnBqSpec extends SparkSpecBase {

  /** Deterministic pseudo-random 64-dim vector (no RNG — same values
    * every run, mixed signs). */
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64) { j =>
      val x = math.sin(seed * 97.0 + j * 13.7)
      (if (math.abs(x) < 1e-9) 1.0 else x).toFloat
    }

  /** Reference pack in plain Scala over the RAW vector — normalization
    * divides by a positive norm, so signs (and the mask) are
    * unchanged. */
  private def refBits(v: Array[Float]): Long =
    (0 until 64).foldLeft(0L) { (acc, j) =>
      if (v(j) > 0f) acc | (1L << j) else acc
    }

  private def frame(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("dim 63 packs into the BIGINT sign bit") {
    val only63 = Array.tabulate(64)(j => if (j == 63) 1.0f else -1.0f)
    val got = ops.Similarity.bqBits(spark, frame(Seq((0L, only63))))
      .collect().head.getLong(1)
    assert(got === Long.MinValue)
    assert(got === (1L << 63))
  }

  test("engine pack equals the reference mask on mixed-sign vectors") {
    val rows = (0L until 12L).map(i => (i, vec(i.toInt)))
    val got = ops.Similarity.bqBits(spark, frame(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) => assert(got(id) === refBits(v), s"id=$id") }
  }

  test("bit_count(xor) Hamming equals per-dim sign-mismatch count") {
    val a = vec(3); val b = vec(7)
    val mismatches = (0 until 64).count(j => (a(j) > 0f) != (b(j) > 0f))
    assert(java.lang.Long.bitCount(refBits(a) ^ refBits(b)) === mismatches)
  }

  test("exact duplicate of a query ranks 1 with hamming 0, cosine 1") {
    // query 0 has a verbatim copy at id 100; ids >= 20 are corpus-only
    val rows = Seq((0L, vec(1)), (100L, vec(1))) ++
      (20L until 40L).map(i => (i, vec(i.toInt)))
    val e = ops.Similarity.normalize(spark, frame(rows))
    val top = ops.Similarity.bqSearch(spark, e)
      .filter("query_id = 0 AND rank = 1").collect().head
    assert(top.getAs[Long]("cand_id") === 100L)
    assert(top.getAs[Int]("hamming") === 0)
    assert(math.abs(top.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("full op shape on testdata: 3 ranks per query, cosine descending") {
    val rows = SparkEntry.queries("ann_bq")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3), s"q=$q")
      val cos = rs.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("cosine")).toSeq
      assert(cos === cos.sorted.reverse, s"q=$q not descending: $cos")
    }
  }
}
