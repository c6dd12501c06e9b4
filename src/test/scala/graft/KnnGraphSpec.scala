package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Pins the kNN-graph contract: edges only between LSH candidates
  * (re-derived independently), ranks contiguous from 1 with
  * non-increasing cosine, never a self-edge, at most k per source. */
class KnnGraphSpec extends SparkSpecBase {

  private lazy val graph =
    SparkEntry.queries("knn_graph")(spark, sf).cache()

  test("shape: no self-edges, ≤3 per source, ranks contiguous, cosine sorted") {
    import spark.implicits._
    assert(graph.filter($"src" === $"nb").count() === 0)
    val bySrc = graph.groupBy("src").agg(
      count(lit(1)).as("n"), max("rank").as("maxr"),
      expr("max(rank) != count(1)").as("gap"))
    assert(bySrc.filter($"n" > 3 || $"gap").count() === 0)
    // within a source, higher rank never has higher cosine
    val inverted = graph.as("a").join(graph.as("b"),
      $"a.src" === $"b.src" && $"a.rank" < $"b.rank" &&
        $"a.cosine" < $"b.cosine")
    assert(inverted.count() === 0)
  }

  test("every edge is a symmetrized LSH candidate pair") {
    import spark.implicits._
    val e = Similarity.normalize(spark, Tables.embeddings(spark, sf))
    val cand = Similarity.embeddingCandidates(spark, e, Similarity.MaxEmbBucket)
    val sym = cand.select($"vec_a".as("src"), $"vec_b".as("nb"))
      .union(cand.select($"vec_b".as("src"), $"vec_a".as("nb")))
    assert(graph.select("src", "nb").join(sym, Seq("src", "nb"), "left_anti")
      .count() === 0)
  }

  test("refined graph keeps the shape contract and never loses cosine mass") {
    import spark.implicits._
    val ref = SparkEntry.queries("knn_graph_refined")(spark, sf).cache()
    assert(ref.filter($"src" === $"nb").count() === 0)
    val bySrc = ref.groupBy("src").agg(
      count(lit(1)).as("n"), expr("max(rank) != count(1)").as("gap"))
    assert(bySrc.filter($"n" > 3 || $"gap").count() === 0)
    // refinement re-ranks a pool that CONTAINS the seed graph's kept
    // pairs, so per source the best refined cosine is >= the best
    // seed cosine
    val best = graph.filter($"rank" === 1)
      .select($"src", $"cosine".as("seed_best"))
      .join(ref.filter($"rank" === 1)
        .select($"src", $"cosine".as("ref_best")), "src")
    assert(best.filter($"ref_best" < $"seed_best").count() === 0)
    ref.unpersist()
  }

  test("recall report: monotone hits per round, bounded pools") {
    import spark.implicits._
    val rep = SparkEntry.queries("knn_recall_report")(spark, sf).cache()
    assert(rep.count() === 60, "20 queries x 3 rounds")
    // the exact top-3 are the globally highest cosines, so only other
    // exact members can displace one from a kept list: per-query hits
    // are non-decreasing round over round
    val wide = rep.groupBy("query_id")
      .pivot("family", Seq("nnd_r0", "nnd_r1", "nnd_r2"))
      .agg(first("n_hits"))
    assert(wide.filter($"nnd_r1" < $"nnd_r0" || $"nnd_r2" < $"nnd_r1")
      .count() === 0)
    // NN-descent pools are (2k)^2-bounded: kept k + (2k)^2 proposals
    assert(rep.filter($"family" =!= "nnd_r0" && $"n_cand" > 3 + 36)
      .count() === 0)
    rep.unpersist()
  }
}
