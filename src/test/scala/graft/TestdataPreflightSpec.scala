package graft

import org.apache.spark.sql.types.{ArrayType, FloatType, StringType, TimestampType}

/** Schema-drift tripwire for the driver-generated testdata.
  *
  * Round 8 lost all 24 events-family ops when the driver regenerated
  * `events.parquet` with a different parquet timestamp physical type —
  * the failure surfaced as 71 scattered AnalysisExceptions instead of
  * one named signal. This suite is that signal: every table must load
  * through its `Tables` loader, and the columns whose physical type has
  * historically drifted (events.ts) or that downstream ops depend on
  * structurally (documents.text, embeddings.vec) must normalize to the
  * type the whole catalog assumes. If the environment shifts again,
  * THIS fails first, loudly, with the table name in the message.
  */
class TestdataPreflightSpec extends SparkSpecBase {

  for (name <- Tables.names) {
    test(s"preflight: table '$name' loads and has rows at sf0.001") {
      val df = Tables.load(spark, sf, name)
      assert(df.schema.nonEmpty, s"table '$name' has an empty schema")
      assert(df.limit(1).count() == 1, s"table '$name' is empty — testdata drift?")
    }
  }

  test("preflight: events.ts normalizes to TIMESTAMP through the loader") {
    val t = Tables.events(spark, sf).schema("ts").dataType
    assert(t == TimestampType,
      s"events.ts loads as $t, not TIMESTAMP — the testdata's parquet physical " +
        "type drifted again (was ns→µs in round 8); fix Tables.events first, " +
        "every events-family op depends on it")
  }

  test("preflight: documents.text is STRING and embeddings.embedding is ARRAY<FLOAT>") {
    val doc = Tables.documents(spark, sf).schema("text").dataType
    assert(doc == StringType, s"documents.text loads as $doc, not STRING")
    val emb = Tables.embeddings(spark, sf).schema("embedding").dataType
    assert(emb == ArrayType(FloatType, containsNull = true) ||
      emb == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding loads as $emb, not ARRAY<FLOAT> — every ANN op depends on it")
  }

  test("preflight: events.ts values land in the expected epoch range") {
    // a ns-vs-µs (or s-vs-µs) mix-up shifts unix_micros by 1000× — pin
    // the data to a sane century so unit drift can't pass silently
    import org.apache.spark.sql.functions._
    val r = Tables.events(spark, sf)
      .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val y2000 = 946684800000000L // 2000-01-01 in epoch micros
    val y2100 = 4102444800000000L
    assert(lo >= y2000 && hi <= y2100,
      s"events.ts range [$lo, $hi] µs is outside years 2000-2100 — timestamp unit drift")
  }
}
