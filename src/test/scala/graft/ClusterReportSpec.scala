package graft

/** Invariants for the cluster-composition report: the cells partition
  * the corpus (counts cover it exactly, shares fold to 1), and each
  * cell's exemplar is by construction at least as close to the
  * centroid as the cell average.
  */
class ClusterReportSpec extends SparkSpecBase {

  test("shares sum to 1, counts cover the corpus, exemplar bounds the mean") {
    val rep = SparkEntry.queries("corpus_cluster_report")(spark, sf).collect()
    assert(rep.nonEmpty && rep.length <= 16)
    val n = Tables.embeddings(spark, sf).count()
    assert(rep.map(_.getAs[Long]("n_vecs")).sum === n,
      "every vector is assigned to exactly one cell")
    val shareSum = rep.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"share sum $shareSum")
    for (r <- rep) {
      assert(r.getAs[Double]("exemplar_cosine") >=
        r.getAs[Double]("mean_cosine") - 1e-6)
      assert(r.getAs[Double]("share") > 0.0)
    }
  }
}
