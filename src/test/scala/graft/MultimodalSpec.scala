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

  test("decode is row-local: no shuffle in the decodeBatch plan") {
    val plan = MediaCodec.decodeBatch(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
