package graft

/** The converged clustering variant must produce the EXACT connected
  * components of the simhash pair graph. The reference answer is a
  * driver-side union-find over the collected edge list — collect is
  * test-only; the engine side under test stays fully distributed.
  */
class ClusterSpec extends SparkSpecBase {

  test("converged clustering equals exact union-find components") {
    val edges = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    // attach the larger root under the smaller, so every component's
    // root is its min doc_id — the engine's canonical label
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n)).toMap

    val got = ops.Dedup.clustersConverged(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    spark.catalog.clearCache()
  }
}
