package graft

import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Proves `mm_video_incremental`'s persisted-index contract: the
  * parquet band/gram stores round-trip the live non-batch
  * fingerprints, and every store-fed match is a batch×store near-dup
  * the full batch matcher also surfaces with the SAME Jaccard. */
class VideoIndexSpec extends SparkSpecBase {

  // sf0.001 plants no cross-split video pair; the sf0.01 slice is the
  // smallest fixture that exercises a match (the audio residue-9 note)
  private val vsf = "/root/testdata/sf0.01"

  private def isBatch = graft.functions.TextFns.hash60(
    concat(lit("inc:"), col("doc_id"))) % 10 === 9

  test("the video index round-trips the live non-batch fingerprints") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    val p = ops.Multimodal.ensureVideoIndex(spark, vsf)
    val corpus = ops.Multimodal.videoGrams(
      ops.Multimodal.media(spark, vsf).filter(!isBatch)
        .select($"doc_id", hex($"payload").as("hexp")))
    val liveSets = corpus
      .select($"doc_id", expr("hash60_set(grams)").as("gs"))
    val storedSets = spark.read.parquet(s"$p/gsets")
    assert(storedSets.exceptAll(liveSets).isEmpty &&
      liveSets.exceptAll(storedSets).isEmpty)
    val storedBands = spark.read.parquet(s"$p/bands")
    // band rows only for stored docs, every bucket within the cap
    assert(storedBands.join(liveSets, "doc_id").count()
      === storedBands.count())
    assert(storedBands.groupBy("band", "sig").count()
      .filter(col("count") > ops.Dedup.MaxBucket).count() === 0)
  }

  test("store-fed matches are the batch matcher's cross-split pairs") {
    val inc = SparkEntry.queries("mm_video_incremental")(spark, vsf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(inc.nonEmpty, "the fixture must split at least one planted pair")
    val batch = SparkEntry.queries("mm_video_neardup")(spark, vsf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    inc.foreach { case ((a, b), j) =>
      val key = if (a < b) (a, b) else (b, a)
      assert(batch.contains(key),
        s"incremental pair ($a, $b) missing from the batch matcher")
      assert(batch(key) === j, s"jaccard disagrees for ($a, $b)")
    }
  }
}
