package graft

import org.apache.spark.sql.functions._

/** Pins `graph_leiden_refine`'s repair semantics: a planted
  * internally-disconnected community splits into its connected parts
  * while a connected one survives intact, fragments never cross
  * community boundaries, and on real data the refinement is a
  * partition of the phase-1 label store.
  */
class LeidenRefineSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand fixture: a disconnected community splits, a connected one does not") {
    // community 10: two triangles {1,2,3} and {4,5,6} with NO edge
    // between them (Louvain's documented failure mode); community 20:
    // a connected path {7,8,9}
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (7L, 8L), (8L, 9L))
    val edges = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L,
      5L -> 10L, 6L -> 10L, 7L -> 20L, 8L -> 20L, 9L -> 20L)
      .toDF("node", "label")
    val out = ops.Graph.leidenRefineOf(spark, edges, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out === Map(
      (10L, 1L) -> ((3L, true)), // fragment min-id 1, size 3, split
      (10L, 4L) -> ((3L, true)),
      (20L, 7L) -> ((3L, false))), out.toString)
  }

  test("an inter-community edge never merges fragments across communities") {
    // two communities joined by a (filtered) cross edge: each stays
    // one fragment of its own community, no split
    val e = Seq((1L, 2L), (3L, 4L), (2L, 3L))
    val edges = (e ++ e.map(_.swap)).toDF("src", "dst")
    val labels = Seq(1L -> 100L, 2L -> 100L, 3L -> 200L, 4L -> 200L)
      .toDF("node", "label")
    val out = ops.Graph.leidenRefineOf(spark, edges, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSet === Set((100L, 1L, 2L, false), (200L, 3L, 2L, false)),
      out.mkString(";"))
  }

  test("real data: fragments partition the phase-1 label store exactly") {
    val out = SparkEntry.queries("graph_leiden_refine")(spark, sf).cache()
    val store = spark.read.parquet(
      ops.Graph.ensureLouvainStore(spark, sf)).cache()
    // every node counted once: fragment sizes sum to |V|
    assert(out.agg(sum("n_nodes")).head.getLong(0) === store.count())
    // fragment sizes per community sum to the community's size
    val perComm = out.groupBy("component")
      .agg(sum("n_nodes").as("n"), count(lit(1)).as("nf"))
    val commSizes = store.groupBy(col("label").as("component"))
      .agg(count(lit(1)).as("sz"))
    assert(perComm.join(commSizes, "component")
      .filter(col("n") =!= col("sz")).count() === 0)
    // split is exactly "more than one fragment"
    assert(out.join(perComm, "component")
      .filter(col("split") =!= (col("nf") > 1)).count() === 0)
    // a refined label belongs to exactly one community
    assert(out.groupBy("refined").count().filter(col("count") > 1)
      .count() === 0 ||
      out.groupBy("refined").agg(countDistinct("component").as("c"))
        .filter(col("c") > 1).count() === 0)
    out.unpersist(); store.unpersist()
  }
}
