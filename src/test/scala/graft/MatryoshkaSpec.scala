package graft

import org.apache.spark.sql.functions._

/** Pins `embedding_matryoshka`'s report contract: full-dimension
  * truncation is the identity (recall exactly 1 per query), mean
  * recall is non-decreasing in prefix length (more dims can only add
  * signal on average), and the report covers every (length, query)
  * cell exactly once.
  */
class MatryoshkaSpec extends SparkSpecBase {

  test("matryoshka report: identity at full dims, monotone mean recall") {
    import spark.implicits._
    val out = SparkEntry.queries("embedding_matryoshka")(spark, sf).cache()
    val lengths = out.select("dims").distinct().as[Int].collect().sorted
    assert(lengths === Array(8, 16, 32, 64))
    val q = out.select("query_id").distinct().count()
    assert(out.count() === lengths.length * q, "one row per (length, query)")
    assert(out.filter($"dims" === 64 && $"recall_at_5" =!= 1.0).count() === 0,
      "truncating to the full dimension must reproduce the exact top-5")
    val means = lengths.map(l => out.filter($"dims" === l)
      .agg(avg($"recall_at_5")).head.getDouble(0))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"mean recall must be non-decreasing in prefix length: ${means.toSeq}")
    assert(out.filter($"n_hits" < 0 || $"n_hits" > 5).count() === 0)
  }
}
