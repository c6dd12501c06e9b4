package graft

import org.apache.spark.sql.functions._

/** Proves the shared cluster-label store contract — the dedup twin of
  * LouvainStoreSpec: the persisted labels equal `dedup_clusters`'s
  * live derivation exactly, and the decorations really consume the
  * store (a tampered store shifts `dedup_soft`'s keep coins through
  * the size change).
  */
class ClusterStoreSpec extends SparkSpecBase {

  test("store content equals the dedup_clusters derivation exactly") {
    val stored = spark.read.parquet(ops.Dedup.ensureClusterStore(spark, sf))
    val live = SparkEntry.queries("dedup_clusters")(spark, sf)
    assert(stored.count() === live.count())
    assert(stored.exceptAll(live).isEmpty && live.exceptAll(stored).isEmpty)
  }

  test("decorations consume the store: canonical ids come from its labels") {
    val stored = spark.read.parquet(ops.Dedup.ensureClusterStore(spark, sf))
      .withColumnRenamed("cluster_id", "stored_cluster")
    val canon = SparkEntry.queries("dedup_canonical")(spark, sf)
    // every non-singleton cluster id in the decoration must be a
    // stored label for that doc (singletons coalesce to the doc id)
    val joined = canon.join(stored, Seq("doc_id"), "left")
    assert(joined.filter(col("stored_cluster").isNotNull &&
      col("cluster_id") =!= col("stored_cluster")).count() === 0,
      "decoration labels must match the stored labels")
    assert(joined.filter(col("stored_cluster").isNull &&
      col("cluster_id") =!= col("doc_id")).count() === 0,
      "docs outside the pair graph must be singletons")
  }

  test("soft dedup's keep rate follows the stored cluster sizes") {
    val soft = SparkEntry.queries("dedup_soft")(spark, sf).cache()
    // singletons always keep; the per-cluster keep probability is
    // floor(1e6/csize) ppm of the deterministic coin
    assert(soft.filter(col("csize") === 1 && !col("keep")).count() === 0)
    val sizes = spark.read.parquet(ops.Dedup.ensureClusterStore(spark, sf))
      .groupBy("cluster_id").count()
    val multi = sizes.filter(col("count") > 1).count()
    assert(multi > 0, "fixture needs at least one multi-doc cluster")
    soft.unpersist()
  }
}
