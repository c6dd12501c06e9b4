package graft

import org.apache.spark.sql.functions._

/** Proves `mm_audio_incremental`'s persisted-index contract: the
  * parquet landmark store round-trips the live old-side landmarks
  * (stop-landmark-filtered), and every store-fed match corresponds to
  * a batch-matcher pair with the same alignment (offset up to the
  * doc_a/doc_b orientation difference — the batch op orders by id,
  * the incremental op puts the clip batch on the left).
  */
class AudioIndexSpec extends SparkSpecBase {

  test("the landmark store round-trips the live filtered landmarks") {
    import spark.implicits._
    val stored = spark.read.parquet(ops.Multimodal.ensureAudioIndex(spark, sf))
    val lmOld = ops.Multimodal.audioLandmarks(
      ops.Multimodal.media(spark, sf)
        .filter($"format" === "wav" &&
          !(graft.functions.TextFns.hash60(
            concat(lit("inc:"), $"doc_id")) % 10 === 9))
        .select($"doc_id", hex($"payload").as("hexp")))
    val eligible = lmOld.select($"key", $"doc_id").distinct()
      .groupBy($"key").agg(count(lit(1)).as("n"))
      .filter($"n" <= 16).select($"key")
    val live = lmOld.join(eligible, "key").select($"key", $"doc_id", $"t")
    assert(stored.count() === live.count())
    assert(stored.exceptAll(live).isEmpty && live.exceptAll(stored).isEmpty)
  }

  test("store-fed matches align with the batch matcher's pairs") {
    val inc = SparkEntry.queries("mm_audio_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(inc.nonEmpty, "the fixture must split at least one planted pair")
    val batch = SparkEntry.queries("mm_audio_fingerprint")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    inc.foreach { case (a, b, off) =>
      val (key, expOff) =
        if (a < b) ((a, b), off) else ((b, a), -off)
      assert(batch.contains(key),
        s"incremental pair ($a, $b) missing from the batch matcher")
      assert(batch(key) === expOff,
        s"offset disagrees for ($a, $b): $off vs batch ${batch(key)}")
    }
  }
}
