package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization ADC search (`ann_pq`). The catalog entry's
  * oracle proves cross-engine value identity; these tests prove the
  * operator's actual promise, which testdata cannot (its exact top-1
  * cosines are only ~0.36-0.48 — near the isotropic noise floor, where
  * any compressed method loses rank fidelity):
  *  - on data with unambiguous planted neighbors (cosine ≈ 0.999
  *    partners among isotropic noise) the compressed scan puts the
  *    partner at rank 1 for every query;
  *  - ADC distances are calibrated (close to the true squared L2);
  *  - on testdata the top-3 keeps a recall floor vs the exact scan.
  */
class PqSpec extends SparkSpecBase {

  /** 530 deterministic 64-dim vectors: 500 seeded-random noise ids
    * 20-519 (outside pqSearch's `vec_id < 20` query set), 10 queries
    * ids 0-9, and their near-identical partners ids 1000-1009. */
  private lazy val planted: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val noise = (20 until 520).map(i => (i.toLong, vec()))
    val pairs = (0 until 10).flatMap { i =>
      val v = vec()
      val w = v.map(x => x + rnd.nextGaussian().toFloat * 0.05f)
      Seq((i.toLong, v), (1000L + i, w))
    }
    (noise ++ pairs).toDF("vec_id", "embedding")
  }

  private lazy val plantedResult =
    ops.Similarity.pqSearch(spark,
      ops.Similarity.normalize(spark, planted)).collect()

  test("planted near-identical partners rank first for every query") {
    val top1 = plantedResult.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 10).foreach { i =>
      assert(top1(i.toLong) === 1000L + i, s"query $i top-1: ${top1.get(i.toLong)}")
    }
  }

  test("ADC distances are calibrated against true squared L2") {
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      def unit(v: Array[Double]) = {
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      val (ua, ub) = (unit(a), unit(b))
      2.0 - 2.0 * ua.zip(ub).map { case (x, y) => x * y }.sum
    }
    val errs = plantedResult.map { r =>
      math.abs(r.getDouble(3) - l2sq(vecs(r.getLong(0)), vecs(r.getLong(2))))
    }
    val mae = errs.sum / errs.length
    assert(mae < 0.25, f"ADC mean abs error $mae%.3f")
  }

  test("IVF-ADC agrees with the full ADC scan on shared pairs") {
    // same codebooks, same distance table — wherever the pruned search
    // and the full scan return the same (query, candidate) pair, the
    // ADC distance must be identical to the last rounded digit
    val full = SparkEntry.queries("ann_pq")(spark, sf)
      .select(col("query_id"), col("cand_id"), col("adist").as("full_adist"))
    val pruned = SparkEntry.queries("ann_ivfpq")(spark, sf)
    assert(pruned.count() === 60)
    val disagree = pruned.join(full, Seq("query_id", "cand_id"))
      .filter(col("adist") =!= col("full_adist"))
    assert(disagree.count() === 0)
  }

  test("trained-coarse IVFPQ keeps the planted partner at rank 1") {
    // the real promise of the trained composition: where unambiguous
    // neighbors exist, the k-means prune keeps them and ADC ranks them
    // first. (A trained-vs-id-init recall comparison on TESTDATA would
    // be chance — its embeddings are isotropic noise, so which
    // arbitrary cell geometry probes better is a coin flip; measured
    // 25 vs 31 of 60 one way at sf0.001, within binomial noise.)
    val res = ops.Similarity.ivfPqKmeansSearch(spark,
      ops.Similarity.normalize(spark, planted)).collect()
    val top1 = res.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 10).foreach { i =>
      assert(top1.get(i.toLong) === Some(1000L + i),
        s"query $i top-1: ${top1.get(i.toLong)}")
    }
  }

  test("trained-coarse IVFPQ holds the testdata recall floor") {
    val exact = SparkEntry.queries("ann_bruteforce")(spark, sf)
      .select("query_id", "cand_id")
    val hits = SparkEntry.queries("ann_ivfpq_kmeans")(spark, sf)
      .select("query_id", "cand_id")
      .join(exact, Seq("query_id", "cand_id")).count()
    assert(hits >= 20, s"trained-ivfpq∩exact = $hits of 60")
  }

  test("testdata recall floor vs the exact scan") {
    val exact = SparkEntry.queries("ann_bruteforce")(spark, sf)
      .select("query_id", "cand_id")
    val hits = SparkEntry.queries("ann_pq")(spark, sf)
      .select("query_id", "cand_id")
      .join(exact, Seq("query_id", "cand_id")).count()
    // 60 returned pairs; exact top-5 per query as reference
    assert(hits >= 20, s"pq∩exact = $hits of 60")
  }
}
