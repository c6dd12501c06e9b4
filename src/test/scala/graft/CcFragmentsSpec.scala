package graft

import org.apache.spark.sql.Row
import graft.expressions.GraftFunctions

/** Unit pins for `cc_fragments` — the row-local exact connected
  * components behind `graph_leiden`'s refinement: min-id labels,
  * undirected edge semantics, isolated members via self-edges,
  * deterministic ascending output, and agreement with a reference
  * union-find on random graphs (the property the oracle's
  * provably-converged propagation relies on).
  */
class CcFragmentsSpec extends SparkSpecBase {

  private def frags(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val out = edges.toDF("src", "dst")
      .selectExpr("collect_list(struct(src, dst)) AS es")
      .selectExpr("cc_fragments(es) AS f")
      .first().getSeq[Row](0)
    out.map(r => (r.getLong(0), r.getLong(1)))
  }

  /** Reference: textbook union-find with min-id representatives. */
  private def reference(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.map(n => (n, find(n)))
  }

  test("min-id labels, undirected merge, ascending output") {
    // 5-4, 4-3 chain plus isolated 9: labels collapse to the min id
    val got = frags(Seq((5L, 4L), (4L, 3L), (9L, 9L)))
    assert(got === Seq((3L, 3L), (4L, 3L), (5L, 3L), (9L, 9L)))
  }

  test("self-edges keep isolated members visible") {
    val got = frags(Seq((1L, 1L), (2L, 2L)))
    assert(got === Seq((1L, 1L), (2L, 2L)))
  }

  test("direction does not matter") {
    assert(frags(Seq((7L, 2L))) === frags(Seq((2L, 7L))))
  }

  test("agrees with reference union-find on seeded random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(12)
      val ids = Seq.fill(n)(rnd.nextLong(1000).abs).distinct
      val selfEdges = ids.map(i => (i, i))
      val randEdges = Seq.fill(rnd.nextInt(20))(
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
      val edges = selfEdges ++ randEdges
      assert(frags(edges) === reference(edges), s"trial $trial: $edges")
    }
  }
}
