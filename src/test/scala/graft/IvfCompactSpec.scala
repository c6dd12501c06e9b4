package graft

import org.apache.spark.sql.functions._

/** Pins `ann_ivf_compact`'s maintenance semantics: compaction is a
  * partition of the post-ingest index (every vector counted exactly
  * once), splits happen exactly where the occupancy cap is exceeded,
  * and untouched cells pass through identity.
  */
class IvfCompactSpec extends SparkSpecBase {

  // sf0.001's 200 vectors spread too evenly over the 16-cell floor to
  // exceed the 2x-mean cap; sf0.01 is the smallest fixture with a
  // genuinely oversized cell (the video/audio index spec precedent)
  private val csf = "/root/testdata/sf0.01"

  test("compaction partitions the index and splits only oversized cells") {
    val out = SparkEntry.queries("ann_ivf_compact")(spark, csf).cache()
    val nVec = Tables.embeddings(spark, csf).count()
    assert(out.agg(sum("n_members")).head.getLong(0) === nVec,
      "every indexed vector must land in exactly one compacted cell")
    // split flag is exactly "parent produced more than one cell"
    val perParent = out.groupBy("parent_cell")
      .agg(count(lit(1)).as("n_sub"), sum("n_members").as("parent_occ"))
    assert(out.join(perParent, "parent_cell")
      .filter(col("was_split") =!= (col("n_sub") > 1)).count() === 0)
    // untouched cells pass through with their own id
    assert(out.filter(!col("was_split"))
      .filter(col("parent_cell") =!= col("cell")).count() === 0)
    // each sub-cell of a split is strictly smaller than its parent
    assert(out.join(perParent, "parent_cell")
      .filter(col("was_split") && col("n_members") >= col("parent_occ"))
      .count() === 0)
    // the fixture must actually exercise a split
    assert(out.filter(col("was_split")).count() > 0,
      "no oversized cell in the fixture — compaction untested")
    out.unpersist()
  }

  test("compaction is deterministic") {
    val a = SparkEntry.queries("ann_ivf_compact")(spark, csf)
    val b = SparkEntry.queries("ann_ivf_compact")(spark, csf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
