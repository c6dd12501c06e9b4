package graft

/** Pins `quality_classifier`'s arithmetic to a hand-computed row: a
  * fixture document whose features, logit, sigmoid score, keep
  * decision, and calibration bucket are derived by hand below, plus a
  * degenerate junk document that must fall below the keep threshold.
  * The DuckDB gate proves Spark≡DuckDB; this spec proves both match
  * the MODEL's definition (σ(b + w·f) over 6-dp features).
  */
class QualityClassifierSpec extends SparkSpecBase {

  private def round6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  test("score/keep/bucket match a hand-computed logistic row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    // norm = "the quick brown fox and the dog 42" (34 chars)
    //   alpha chars = 25, digits = 2, tokens = 8, stopwords {the,and,the} = 3
    val good = "The  quick   brown fox AND the dog 42"
    // junk: digit-heavy, no stopwords → wd = -8 dominates
    val junk = "3476 9921 0038 8412"
    Seq((1L, good, "src0"), (2L, junk, "src0"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("quality_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    val fAlpha = round6(25.0 / 34)
    val fDigit = round6(2.0 / 34)
    val fStop = round6(3.0 / 8)
    val fLen = round6(math.log(9.0))
    val z = -5.0 + 4.0 * fAlpha + 5.0 * fStop + 0.5 * fLen + -8.0 * fDigit
    val score = round6(1.0 / (1.0 + math.exp(-z)))
    val g = rows(1L)
    assert(g.getDouble(1) === fAlpha)
    assert(g.getDouble(2) === fStop)
    assert(g.getDouble(3) === fLen)
    assert(g.getDouble(4) === fDigit)
    assert(g.getDouble(5) === score)
    assert(g.getBoolean(6) === (z >= 0.0))
    assert(g.getInt(7) === math.min(math.floor(score * 10).toInt, 9))

    val j = rows(2L)
    assert(!j.getBoolean(6), "digit-heavy junk must not pass the keep gate")
    assert(j.getDouble(5) < 0.5)
  }
}
