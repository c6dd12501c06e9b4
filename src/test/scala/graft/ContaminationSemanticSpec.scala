package graft

import org.apache.spark.sql.Row

/** Planted-paraphrase fixture for `text_contamination_semantic`: the
  * lexical 5-shingle probe (`text_contamination`) cannot see a
  * paraphrased benchmark item, so the semantic variant must — a corpus
  * vector that is a small perturbation of a benchmark vector (the
  * embedding-space signature of a paraphrase) has to surface as a
  * candidate through the banded LSH AND cross the cosine drop
  * threshold, while an unrelated direction must not be flagged.
  */
class ContaminationSemanticSpec extends SparkSpecBase {

  private def deterministic(seed: Int): Array[Float] =
    Array.tabulate(64) { j =>
      // fixed pseudo-random unit-ish components, no RNG state
      (math.sin(seed * 131 + j * 17).toFloat * 0.5f) + 0.01f
    }

  test("a planted paraphrase is flagged; an unrelated direction is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contamsem").toString
    val probes = (0L until 20L).map(i => (i, deterministic(i.toInt)))
    // paraphrase of probe 5: tiny perturbation → near-1 cosine, and all
    // 32 hyperplane signs stay put (dots are far from zero relative to
    // the perturbation), so at least one full band collides
    val para = deterministic(5).zipWithIndex
      .map { case (x, j) => x + (if (j % 2 == 0) 1e-3f else -1e-3f) }
    // unrelated: an axis-aligned direction nearly orthogonal on average
    val far = Array.tabulate(64)(j => if (j == 63) 1.0f else 0.0f)
    val emb = (probes :+ (1000L, para) :+ (1001L, far))
      .toDF("vec_id", "embedding")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("text_contamination_semantic")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3))).toMap
    assert(out.contains(1000L), "planted paraphrase never surfaced as a " +
      "candidate — LSH banding lost a near-identical vector")
    assert(out(1000L) === (5L, true),
      s"paraphrase row was ${out(1000L)}, expected (best_probe=5, flagged)")
    // the unrelated direction may or may not share a band by chance,
    // but it must never cross the drop threshold
    out.get(1001L).foreach { case (_, flagged) =>
      assert(!flagged, "unrelated direction was flagged as contaminated")
    }
  }
}
