package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-probe LSH must dominate single-probe on recall: probing the
  * Hamming-1 neighbor buckets yields a candidate SUPERSET, so overlap
  * with the exact (brute-force) top-3 can only grow. Also pins the
  * probe fan-out so the cost model stays Q×(Planes+1) probes.
  */
class AnnRecallSpec extends SparkSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private lazy val exactTop3 = run("ann_bruteforce")
    .filter(col("rank") <= 3).select("query_id", "cand_id")

  private def recall(name: String): Long =
    run(name).select("query_id", "cand_id")
      .join(exactTop3, Seq("query_id", "cand_id")).count()

  test("sq8 top-3 ≈ exact top-3 (8-bit quantization error is sub-rank)") {
    // SQ8 scans every candidate (no pruning), so the only error source
    // is quantization — at 8 bits per dim that error is far below the
    // inter-candidate cosine gaps; require ≥ 90% overlap with exact.
    val r = recall("ann_sq8")
    assert(r >= 54, s"sq8 recall $r of 60")
  }

  test("multi-probe recall ≥ single-probe recall vs exact top-3") {
    val single = recall("ann_lsh")
    val multi = recall("ann_lsh_multiprobe")
    assert(multi >= single, s"multi=$multi single=$single")
  }

  test("multi-probe candidates are a superset of single-probe's") {
    val single = run("ann_lsh").select("query_id", "cand_id")
    val multi = run("ann_lsh_multiprobe").select("query_id", "cand_id")
    // every single-probe RESULT survives into the multi-probe CANDIDATE
    // set; it may be out-ranked, but only by higher-cosine candidates —
    // checked via: single results missing from multi results must rank
    // below multi's kept top-3 (i.e. multi's worst kept ≥ their cosine)
    val singleFull = run("ann_lsh").withColumnRenamed("cosine", "c_single")
    val multiWorst = run("ann_lsh_multiprobe")
      .groupBy("query_id").agg(min(col("cosine")).as("c_floor"))
    val demoted = singleFull
      .join(multi, Seq("query_id", "cand_id"), "left_anti")
      .join(multiWorst, "query_id")
      .filter(col("c_single") > col("c_floor"))
    assert(demoted.count() === 0)
  }

  test("recall report: arithmetic, bounds, and a lower-bound cross-check") {
    val rep = run("ann_recall_report").cache()
    assert(rep.count() === 60) // one row per (family, probe query)
    assert(rep.select(countDistinct(col("family"))).head().getLong(0) === 3)
    // recall is n_hits/5 exactly; hits bounded by both k and candidates
    assert(rep.filter(col("recall_at_5") =!= col("n_hits") / 5.0).count() === 0)
    assert(rep.filter(col("n_hits") > least(lit(5L), col("n_cand"))).count() === 0)
    // independent lower bound: any ann_lsh top-3 result that is also in
    // the exact top-5 must be counted as a hit by the lsh family rows
    val exactTop5 = run("ann_bruteforce")
      .filter(col("rank") <= 5).select("query_id", "cand_id")
    val floor = run("ann_lsh").select("query_id", "cand_id")
      .join(exactTop5, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(count(lit(1)).as("floor_hits"))
    val below = rep.filter(col("family") === "lsh").join(floor, "query_id")
      .filter(col("n_hits") < col("floor_hits"))
    assert(below.count() === 0)
    // family cost/recall structure: sq8 scans everything (n_cand =
    // N-1) and must dominate the pruned families on total recall;
    // ivfpq's candidates are cell-pruned, strictly fewer than sq8's
    val byFam = rep.groupBy("family")
      .agg(sum(col("n_hits")).as("hits"), max(col("n_cand")).as("maxc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.embeddings(spark, sf).count()
    assert(byFam("sq8")._2 === n - 1)
    assert(byFam("ivfpq")._2 < n - 1)
    assert(byFam("sq8")._1 >= byFam("ivfpq")._1)
    assert(byFam("sq8")._1 >= byFam("lsh")._1)
    rep.unpersist()
  }

  test("k-means|| init recall ≥ md5-sample init recall vs exact top-3") {
    // the d²-spread seeding is the production init; it must not lose
    // recall to the demo-grade md5-min sample it replaces
    val md5Init = recall("ann_ivf_kmeans")
    val kpp = recall("ann_ivf_kmeans_scalable")
    assert(kpp >= md5Init, s"kpp=$kpp md5=$md5Init")
  }

  test("k-means|| init beats md5-sample init on clustering cost at equal rounds") {
    // the paper's actual guarantee is on the k-means objective
    // φ = Σ d²(x, nearest centroid), not on fixed-nprobe recall (which
    // is boundary noise on near-uniform synthetic embeddings) — pin φ
    // strictly better at the SAME number of Lloyd rounds
    import ops.Similarity
    val e = Similarity.normalize(spark, Tables.embeddings(spark, sf)).cache()
    def phi(c: org.apache.spark.sql.DataFrame): Double =
      Similarity.assignCells(e.select(col("ne")), c)
        .join(c, "cell")
        .withColumn("d2", lit(2.0) - lit(2.0) * expr("vec_dot(ne, cv)"))
        .agg(sum(col("d2"))).head().getDouble(0)
    val md5Phi = phi(Similarity.kmeansCentroids(spark, e, 16, 2))
    val kppPhi = phi(Similarity.kmLloyd(spark, e,
      Similarity.kmeansParInit(spark, e, 16), 2))
    assert(kppPhi < md5Phi, s"kpp=$kppPhi md5=$md5Phi")
  }

  test("k-means|| init yields at most k distinct, unit-norm centroids") {
    import ops.Similarity
    val e = Similarity.normalize(spark, Tables.embeddings(spark, sf))
    val init = Similarity.kmeansParInit(spark, e, 16).cache()
    assert(init.count() <= 16)
    assert(init.select(countDistinct(col("cell"))).head().getLong(0)
      === init.count())
    // centroids are renormalized: |cv|² = 1 within fp tolerance
    val offUnit = init
      .withColumn("n2", expr("vec_dot(cv, cv)"))
      .filter(abs(col("n2") - 1.0) > 1e-9)
    assert(offUnit.count() === 0)
  }

  test("range search contains every single-probe pair above its radius") {
    // ann_range_search probes a SUPERSET of ann_lsh's buckets (own +
    // Hamming-1), so any same-bucket pair at cosine ≥ 0.3 must appear
    // in the range result — and every returned pair honors the radius.
    val range = run("ann_range_search").cache()
    assert(range.filter(col("cosine") < 0.3).count() === 0)
    val missing = run("ann_lsh")
      .filter(col("cosine") >= 0.3).select("query_id", "cand_id")
      .join(range.select("query_id", "cand_id"),
        Seq("query_id", "cand_id"), "left_anti")
    assert(missing.count() === 0)
    range.unpersist()
  }
}
