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
}
