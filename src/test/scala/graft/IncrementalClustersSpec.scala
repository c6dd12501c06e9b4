package graft

import org.apache.spark.sql.functions._

/** Proves `dedup_clusters_incremental`'s production contract: the
  * store path (parquet simhash signatures + parquet cluster labels) is
  * assignment-identical to the in-query op, and the adoption semantics
  * — stable ids, transitive adoption through the new×new subgraph,
  * bridge-event surfacing — are pinned by hand on a crafted signature
  * fixture fed straight into the core (signatures are just longs, so
  * the fixture controls the pair graph exactly).
  */
class IncrementalClustersSpec extends SparkSpecBase {

  test("store path: parquet signature+label stores reproduce the catalog op") {
    expressions.GraftFunctions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val oldSim = ops.Dedup.simhashOf(
      docs.filter(!ops.Dedup.isNewBatch(col("doc_id"))))
    val storeLabels = ops.Dedup.boundedClusterLabels(
      ops.Dedup.simBandSelfPairs(ops.Dedup.simBandRows(oldSim))
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val dir = java.nio.file.Files.createTempDirectory("clinc").toString
    oldSim.write.parquet(s"$dir/sim")
    storeLabels.write.parquet(s"$dir/labels")
    val fromStore = ops.Dedup.clustersIncrementalCore(spark,
      ops.Dedup.simhashOf(docs.filter(ops.Dedup.isNewBatch(col("doc_id")))),
      docs.filter(ops.Dedup.isNewBatch(col("doc_id"))).select("doc_id"),
      spark.read.parquet(s"$dir/sim"), spark.read.parquet(s"$dir/labels"))
    val inQuery = SparkEntry.queries("dedup_clusters_incremental")(spark, sf)
    assert(fromStore.collect().toSeq === inQuery.collect().toSeq,
      "assignment from parquet stores must equal the in-query op")
  }

  test("adoption semantics pinned by hand on a crafted signature fixture") {
    import spark.implicits._
    // Old corpus: cluster {10,11} at sig 0x0 (label 10), cluster
    // {20,21} at sig 0x3F000000 (label 20) — 6 bits apart, so the two
    // clusters are NOT near-dups of each other.
    val storeSim = Seq((10L, 0L), (11L, 0L),
      (20L, 0x3F000000L), (21L, 0x3F000000L)).toDF("doc_id", "simhash")
    val storeLabels = Seq((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    // New batch: 3 = exact member of old cluster 10 (and id 3 < 10 —
    // the stable-id case); 4 = hamming-3 from BOTH old clusters (the
    // bridge); 5,6 = a new-only pair; 7 = isolated; 13 = hamming-1
    // from 4 but > 3 from every old doc (adopts only transitively).
    val newSim = Seq((3L, 0L), (4L, 0x07000000L), (5L, 0x00FF0000L),
      (6L, 0x00FF0000L), (7L, 0x55AA55AAL), (13L, 0x07000001L))
      .toDF("doc_id", "simhash")
    val newDocs = newSim.select("doc_id")
    val out = ops.Dedup.clustersIncrementalCore(
        spark, newSim, newDocs, storeSim, storeLabels)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(3L) === ((10L, true, 2L, 1L)),
      "an exact member adopts the OLD cluster id even though 3 < 10")
    assert(out(4L) === ((10L, true, 4L, 2L)),
      "a bridge doc adopts the min label and reports n_bridged = 2")
    assert(out(5L) === ((5L, false, 0L, 0L)) &&
      out(6L) === ((5L, false, 0L, 0L)),
      "a new-only pair forms its own min-id cluster")
    assert(out(7L) === ((7L, false, 0L, 0L)), "an isolated doc is a singleton")
    assert(out(13L) === ((10L, true, 0L, 0L)),
      "adoption must propagate transitively through the new×new subgraph")
  }

  test("cluster ids are stable: adopted ids are old docs, fresh ids are new") {
    import spark.implicits._
    val out = SparkEntry.queries("dedup_clusters_incremental")(spark, sf)
      .cache()
    val oldIds = Tables.documents(spark, sf)
      .filter(!ops.Dedup.isNewBatch(col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    val rows = out.select("doc_id", "cluster_id", "adopted")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, c, adopted) =>
      if (adopted) assert(oldIds.contains(c),
        s"adopted label $c of $id must reference an existing old doc")
      else assert(!oldIds.contains(c) && c <= id,
        s"fresh label $c of $id must be a new-batch min id")
    }
  }
}
