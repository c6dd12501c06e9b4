package graft

import org.apache.spark.sql.functions._
import graft.ops.{MediaCodec, Multimodal}

/** The multimodal plumbing that the oracle gate cannot cover: the
  * binary payload round-trip and the partition-batched decode surface
  * (the stubbed codec boundary).
  */
class MultimodalSpec extends SparkSpecBase {

  private lazy val media = Multimodal.media(spark, sf)

  test("payload is magic header + utf-8 text, schema is binary") {
    import spark.implicits._
    assert(media.schema("payload").dataType.typeName === "binary")
    val row = media.join(Tables.documents(spark, sf), "doc_id")
      .select($"doc_id", $"format", $"payload", $"text").first()
    val bytes = row.getAs[Array[Byte]]("payload")
    val magic = new String(bytes.take(4), "UTF-8")
    val body = new String(bytes.drop(4), "UTF-8")
    assert(Seq("PNG0", "JPG0", "WAV0").contains(magic))
    assert(body === row.getAs[String]("text"))
  }

  test("spark hex(binary) is uppercase like the DuckDB oracle's") {
    import spark.implicits._
    val h = media.select(hex($"payload").as("h")).first().getString(0)
    assert(h === h.toUpperCase)
  }

  test("decodeBatch: deterministic fake decode, histogram sums to size") {
    import spark.implicits._
    val decoded = MediaCodec.decodeBatch(media)
    val n = media.count()
    assert(decoded.count() === n)
    val bad = decoded.toDF()
      .join(media.select($"doc_id", length($"payload").as("len")), "doc_id")
      .filter(expr("aggregate(byte_hist, 0L, (a, x) -> a + x) <> len"))
      .count()
    assert(bad === 0)
    // determinism: two runs, identical frames
    val again = MediaCodec.decodeBatch(media)
    assert(decoded.toDF().exceptAll(again.toDF()).isEmpty)
  }

  test("real PNG payloads decode via javax.imageio: exact pixels, dims, histogram") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // 4×2 PNG: top row black (luma 0 → bin 0), bottom row white
    // (luma 255 → bin 15); plus a 1×1 mid-gray; generated IN-TEST —
    // no binary fixtures, and the expected stats are hand-computable
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val bw = png(4, 2, (_, y) => if (y == 0) 0x000000 else 0xffffff)
    val gray = png(1, 1, (_, _) => 0x808080) // luma (128*299+128*587+128*114)/1000 = 128
    // declared metadata is WRONG on purpose: real decode must report
    // the image's own dimensions, not trust the column
    val frame = Seq((1L, "png", 999, 999, bw), (2L, "png", 999, 999, gray))
      .toDF("doc_id", "format", "width", "height", "payload")
    val out = MediaCodec.decodeBatch(frame).collect().sortBy(_.doc_id)

    assert(out(0).width === 4 && out(0).height === 2)
    assert(out(0).mean_byte === 127.5) // 4×0 and 4×255 over 8 pixels
    assert(out(0).byte_hist.toSeq === (Seq(4L) ++ Seq.fill(14)(0L) ++ Seq(4L)))
    assert(out(1).width === 1 && out(1).height === 1)
    assert(out(1).mean_byte === 128.0)
    assert(out(1).byte_hist(8) === 1L && out(1).byte_hist.sum === 1L)
    // and decode is deterministic: a second pass is bit-identical
    val again = MediaCodec.decodeBatch(frame).collect().sortBy(_.doc_id)
    assert(out.zip(again).forall { case (a, b) =>
      a.mean_byte == b.mean_byte && a.byte_hist.sameElements(b.byte_hist)
    })
  }

  test("synthetic (non-PNG) payloads keep the documented stub path") {
    import spark.implicits._
    // the magic-header corpus payloads are NOT PNGs — decode must use
    // byte stats with the declared metadata passed through
    val p = "JPG0hello".getBytes("UTF-8")
    val d = MediaCodec.decode(7L, "jpeg", 12, 34, p)
    assert(!MediaCodec.isPng(p))
    assert(d.width === 12 && d.height === 34)
    assert(d.byte_hist.sum === p.length)
  }

  test("decode is row-local: no shuffle in the decodeBatch plan") {
    val plan = MediaCodec.decodeBatch(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mm_video_neardup surfaces the planted trim pairs; every emitted " +
    "pair meets the threshold against exact sequence Jaccard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("mm_video_neardup")(spark, sf).cache()
    // emitted pairs are verified: jaccard ≥ threshold and ordered ids
    assert(out.filter(col("jaccard") < 0.3 ||
      col("doc_a") >= col("doc_b")).count() === 0)
    // the LSH-exactness floor for this geometry: a pair sharing its
    // FULL shingle set (J = 1) has identical signatures, hence every
    // band collides — it MUST surface. Trim pairs at J ≥ 0.7 are
    // probabilistic (8×2 → ~99.9 %); pin the measured corpus: at
    // least 3 of the 5 exact-Jaccard ≥ 0.7 pairs surface, and overall
    // recall against the brute-force J ≥ 0.3 pair set exceeds half —
    // the whole point of the 8×2 geometry (4×4 measured 4/14 here).
    val exact = {
      val m = ops.Multimodal.media(spark, sf)
        .select(col("doc_id"), hex(col("payload")).as("hexp"))
        .withColumn("nf", expr("(length(hexp) + 127) div 128"))
        .filter(col("nf") >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, nf - 2), i ->
            |  concat(md5(substring(hexp, i * 128 + 1, 128)),
            |         md5(substring(hexp, (i + 1) * 128 + 1, 128))))"""
            .stripMargin)).as("g")).distinct()
      val sizes = exactSizes(m)
      m.as("a").join(m.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.3)
        .select("doc_a", "doc_b")
    }
    val nExact = exact.count()
    val caught = exact.join(out, Seq("doc_a", "doc_b")).count()
    assert(nExact > 0, "the corpus must contain trim pairs")
    assert(caught * 2 > nExact,
      s"8x2 banding must recall over half the J >= 0.3 pairs ($caught/$nExact)")
  }

  private def exactSizes(m: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    m.groupBy("doc_id").agg(count(lit(1)).as("n"))
  }

  test("pair filter keeps the planted matched pair and drops the mismatch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // matched: text vector is 2x the image features (cosine exactly 1,
    // top decile); mismatched: negated features (cosine -1, decile 0);
    // noise: a vector orthogonal to fv in its first two dims
    val f = Array(0.5, 0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8)
    val img = Seq((1L, f), (2L, f)).toDF("doc_id", "fv")
    val txt = Seq((1L, f.map(_ * 2.0)), (2L, f.map(-_)))
      .toDF("doc_id", "tv")
    val r = ops.Multimodal.pairFilter(spark, img, txt).collect()
      .map(x => x.getLong(0) ->
        ((x.getBoolean(2), x.getInt(3), x.getDouble(1)))).toMap
    assert(r(1L)._1 && r(1L)._2 === 9 && math.abs(r(1L)._3 - 1.0) < 1e-6)
    assert(!r(2L)._1 && r(2L)._2 === 0 && math.abs(r(2L)._3 + 1.0) < 1e-6)
    // gate/decile arithmetic holds over the real corpus too
    val full = SparkEntry.queries("mm_text_pair_filter")(spark, sf)
    assert(full.filter(col("keep") =!= (col("clip_score") >= 0.2)).count()
      <= full.count() / 100) // 6-dp rounding can straddle the gate edge
    assert(full.filter(col("score_decile") < 0 || col("score_decile") > 9)
      .count() === 0)
  }

  test("mm_phash recalls every exact-duplicate payload pair at hamming 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // identical payloads ⇒ identical phash ⇒ same buckets in every
    // band ⇒ the pair MUST surface with hamming 0 (LSH-exactness floor)
    val docs = Tables.documents(spark, sf)
      .withColumn("ch", md5(col("text")))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val phash = SparkEntry.queries("mm_phash")(spark, sf)
    val missed = dupPairs.join(
      phash.filter(col("hamming") === 0), Seq("doc_a", "doc_b"), "left_anti")
      .count()
    assert(missed === 0)
    assert(phash.filter(col("hamming") > 3 || col("doc_a") >= col("doc_b"))
      .count() === 0)
  }

  test("audioFingerprintOf: a planted clip aligns at its true offset") {
    import spark.implicits._
    // four distinct 128-hex "frames"; doc 1 = ABCD, doc 2 = XY + ABCD
    // (the clip two frames in), doc 3 unrelated. The shared 4-frame
    // run yields C(4,2) = 6 landmarks with fanout 3 — (0,1..3),
    // (1,2..3), (2,3) — all voting offset t1 − t2 = −2.
    def fr(c: Char) = c.toString * 128
    val docs = Seq(
      (1L, fr('a') + fr('b') + fr('c') + fr('d')),
      (2L, fr('x') + fr('y') + fr('a') + fr('b') + fr('c') + fr('d')),
      (3L, fr('p') + fr('q') + fr('r'))
    ).toDF("doc_id", "hexp")
    val r = ops.Multimodal.audioFingerprintOf(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(r === Seq((1L, 2L, -2L, 6L)), r.toString)
  }

  test("mm_audio_fingerprint: matches are wav-only, ordered, above the vote floor") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("mm_audio_fingerprint")(spark, sf).cache()
    assert(out.filter(col("doc_a") >= col("doc_b") || col("n_votes") < 4)
      .count() === 0)
    // every matched doc really is a wav payload (doc_id % 3 == 2)
    assert(out.filter(col("doc_a") % 3 =!= 2 || col("doc_b") % 3 =!= 2)
      .count() === 0)
    out.unpersist()
  }
}
