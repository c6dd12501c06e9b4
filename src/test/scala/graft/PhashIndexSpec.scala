package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Proves `mm_phash_incremental`'s persisted-index contract: the
  * parquet band store round-trips the live non-batch signatures with
  * every bucket inside the width cap, and every store-fed match is a
  * batch×store pair the full matcher also surfaces with the SAME
  * Hamming distance.
  */
class PhashIndexSpec extends SparkSpecBase {

  // same fixture note as the video/audio indexes: sf0.001 has too few
  // media docs to plant a cross-split pair
  private val psf = "/root/testdata/sf0.01"

  private def isBatch = graft.functions.TextFns.hash60(
    concat(lit("inc:"), col("doc_id"))) % 10 === 9

  test("the phash index round-trips the live non-batch band rows") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    val p = ops.Multimodal.ensurePhashIndex(spark, psf)
    val stored = spark.read.parquet(s"$p/bands").cache()
    val live = ops.Multimodal.phashBands(ops.Multimodal.phashSigs(
      ops.Multimodal.media(spark, psf).filter(!isBatch)
        .select($"doc_id", hex($"payload").as("hexp"))))
    // stored rows are exactly the live rows minus over-capped buckets
    assert(stored.exceptAll(live).isEmpty,
      "a stored band row does not match any live recompute")
    assert(stored.groupBy("band", "nib").count()
      .filter(col("count") > 4096).count() === 0)
    // only non-batch docs in the store
    assert(stored.filter(isBatch).count() === 0)
    stored.unpersist()
  }

  // Fixture dependency: the two matchers cap bucket width over
  // DIFFERENT populations (store-only vs all docs), so a bucket under
  // the 4096 cap among stored docs but over it with batch docs included
  // could legitimately yield an incremental pair the batch matcher
  // drops. sf0.01's widest media bucket sits far below the cap on
  // either population, so the subset assertion is exact here; a fixture
  // with cap-straddling buckets would need the assertion scoped to
  // pairs whose (band, nib) bucket is under the cap in batch counting.
  test("store-fed matches are the batch matcher's cross-split pairs") {
    val inc = SparkEntry.queries("mm_phash_incremental")(spark, psf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(inc.nonEmpty, "the fixture must split at least one near-dup pair")
    val batch = SparkEntry.queries("mm_phash")(spark, psf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    inc.foreach { case ((a, b), h) =>
      val key = if (a < b) (a, b) else (b, a)
      assert(batch.contains(key),
        s"incremental pair ($a, $b) missing from the batch matcher")
      assert(batch(key) === h, s"hamming disagrees for ($a, $b)")
    }
  }
}
