package graft

import org.apache.spark.sql.functions._

/** Invariants of the iterative graph family (`ops/Graph.scala`) that
  * the oracle hash-compare can't see on its own: PageRank mass
  * conservation and rank positivity. The co-order graph is symmetric,
  * so every node has outdeg ≥ 1 and no rank mass leaks to dangling
  * nodes — total mass must stay ~1 through every round (drift bounded
  * by the per-round 9-dp quantization × node count).
  */
class GraphSpec extends SparkSpecBase {

  test("pagerank conserves rank mass on the dangling-free co-order graph") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    val row = pr.agg(
      sum(col("pr")).as("mass"),
      min(col("pr")).as("lo"),
      count(lit(1)).as("n")).head()
    val mass = row.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass drifted: $mass")
    assert(row.getDouble(1) > 0.0, "a node lost all rank")
    assert(row.getLong(2) > 0)
  }

  test("pagerank ranks high-degree nodes above low-degree ones on average") {
    // suppliers serve many customers (dense side of the bipartite
    // graph), so the mean supplier rank must exceed the mean customer
    // rank — the qualitative property PageRank exists to measure.
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    val means = pr.groupBy(col("node_type")).agg(avg(col("pr")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("supplier") > means("customer"), means.toString)
  }
}
