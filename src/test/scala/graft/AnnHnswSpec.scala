package graft

import org.apache.spark.sql.functions._

/** `ann_hnsw` (geometric-batch insertion build): the pruned adjacency
  * must respect the degree cap with no self-edges, the
  * neighbor-of-neighbor refinement must actually link SAME-batch
  * near-neighbors (the pairs a pure insert-into-older-graph build
  * cannot see), and the measured search must beat brute-force cost
  * while finding real neighbors.
  */
class AnnHnswSpec extends SparkSpecBase {

  // the op's staging discipline: lazy checkpoint leaves sever the
  // round-over-round self-join lineage (the build is iterative)
  private lazy val adj = {
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
    ops.Similarity.hnswBuild(e,
      df => df.localCheckpoint(eager = false)).cache()
  }

  test("adjacency: degree-capped, no self-edges") {
    import spark.implicits._
    assert(adj.filter($"src" === $"nb").count() === 0)
    val maxDeg = adj.groupBy($"src").count()
      .agg(max($"count")).head.getLong(0)
    assert(maxDeg <= ops.Similarity.BeamDegree)
  }

  test("refinement links same-batch neighbors the walk alone cannot") {
    import spark.implicits._
    // the final non-empty batch is [256, 512): an edge with BOTH
    // endpoints there can only come from the 2-hop NoN pass (the walk
    // scores a batch against strictly older nodes)
    assert(adj.filter($"src" >= 256 && $"nb" >= 256).count() > 0)
  }

  test("every node outside the seed acquired edges (insertion covered)") {
    import spark.implicits._
    val n = Tables.embeddings(spark, sf).count()
    val covered = adj.select($"src").union(adj.select($"nb"))
      .distinct().count()
    assert(covered === n,
      s"only $covered of $n nodes reachable in the built graph")
  }

  test("incremental: every ingest vector answered, only from the store") {
    import spark.implicits._
    val isNew = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ing:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 10 == 0
    }
    val ids = Tables.embeddings(spark, sf).select($"vec_id")
      .collect().map(_.getLong(0))
    val newIds = ids.filter(isNew).toSet
    val rows = SparkEntry.queries("ann_hnsw_incremental")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("inc_id")).toSet === newIds,
      "every ingest vector gets an answer, no indexed vector does")
    rows.groupBy(_.getAs[Long]("inc_id")).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3), s"$id")
    }
    // candidates come from the INDEXED slice only — the walk never
    // touches another ingest vector (store discipline)
    assert(rows.forall(r => !newIds(r.getAs[Long]("cand_id"))))
  }

  test("measured frontier: 20 queries, sane recall, sub-brute-force cost") {
    import spark.implicits._
    val rows = SparkEntry.queries("ann_hnsw")(spark, sf).collect()
    assert(rows.length === 20)
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_5")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_cand") < n / 2,
        "walk cost should be far below the brute-force scan")
    }
    val mean = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(mean >= 0.3, s"mean recall $mean collapsed")
  }
}
