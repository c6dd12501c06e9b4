package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Invariants of the diagnostics family (`ops/Diagnostics.scala`)
  * beyond the oracle hash-compare: the lateness profiler must bucket
  * genuinely out-of-order streams (the shipped events table is fully
  * in-order, so the catalog row only exercises the on-time path), and
  * the PCA power iteration must land on a unit vector whose captured
  * variance dominates every single coordinate's.
  */
class DiagnosticsSpec extends SparkSpecBase {

  private def ts(m: Long): Timestamp = new Timestamp(1704067200000L + m * 60000L)

  test("lateness profiler buckets an out-of-order stream") {
    import spark.implicits._
    // user 1: event 3 arrives (id order) 30 s behind the running max,
    // event 4 a full 2 h behind; user 2 stays in order.
    val ev = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(180)), (1L, 3L, ts(179)),
      (1L, 4L, ts(60)), (2L, 5L, ts(0)), (2L, 6L, ts(1))
    ).toDF("user_id", "event_id", "ts")
    val got = ops.Diagnostics.latenessProfile(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("a_on_time", 4L, 0L),
      ("b_under_1m", 1L, 60000000L),     // 1 minute behind
      ("e_over_1h", 1L, 7200000000L)),   // 2 hours behind
      got.toString)
  }

  test("lateness shares sum to 1") {
    val shares = SparkEntry.queries("diag_lateness")(spark, sf)
      .agg(sum(col("share"))).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-6, shares.toString)
  }

  test("gramian partials reduce to exact whole-corpus sums") {
    import spark.implicits._
    // 3 vectors spread over 3 partitions: partial merge must be exact
    val emb = Seq(
      Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(0.5f, -1.5f)
    ).toDF("embedding").repartition(3)
    val (n, s, sp) = ops.Diagnostics.pcaGramian(emb)
    assert(n === 3L)
    assert(s.map(_.doubleValue).toSeq === Seq(4.5, 4.5))
    // upper triangle of Σ x xᵀ: [1+9+0.25, 2+12-0.75; ·, 4+16+2.25]
    assert(sp(0)(0).doubleValue === 10.25)
    assert(sp(1)(0).doubleValue === 13.25)
    assert(sp(1)(1).doubleValue === 22.25)
  }

  test("pca loading is unit-norm and captures more variance than any axis") {
    import spark.implicits._
    val pca = SparkEntry.queries("embedding_pca")(spark, sf)
      .collect().sortBy(_.getLong(0))
    val v = pca.map(_.getDouble(2))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loading norm $norm")

    // variance captured along v must be >= the best single coordinate
    // (the top eigenvalue dominates every diagonal entry of the
    // covariance) — allow the quantization quanta as slack.
    val x = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")))
      .select(col("pos").cast("long").as("i"), col("col").cast("double").as("xi"))
    val perAxis = x.groupBy(col("i"))
      .agg(var_samp(col("xi")).as("s2"))
      .agg(max(col("s2"))).head().getDouble(0)
    val vlit = array(v.map(lit): _*)
    val proj = Tables.embeddings(spark, sf)
      .select(aggregate(
        zip_with(col("embedding").cast("array<double>"), vlit, (a, b) => a * b),
        lit(0.0), (acc, e) => acc + e).as("p"))
    val projVar = proj.agg(var_samp(col("p"))).head().getDouble(0)
    assert(projVar >= perAxis - 1e-6, s"projVar $projVar < best axis $perAxis")
  }

  test("gini: 0 on a uniform distribution, hand-computed on a 9:1 skew") {
    import spark.implicits._
    def events(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, u) => (0 until c).map(i => (u.toLong, u * 1000L + i))
    }.toDF("user_id", "event_id")
    // 4 users × 5 events each → perfectly equal → gini 0, shares flat
    val uniform = ops.Diagnostics.giniOf(events(Seq(5, 5, 5, 5))).first()
    assert(uniform.getAs[Double]("gini") === 0.0)
    // 10 users, one holds 91 of 100 events → grouped-data gini:
    // hist = (1×9 users, 91×1); Σ users·(S_{i-1}+S_i) = 9·(0+9)+1·(9+100)
    // = 190 → 1 − 190/1000 = 0.81; top-10% = the 1 heavy user = 0.91
    val skewed = ops.Diagnostics.giniOf(events(Seq.fill(9)(1) :+ 91)).first()
    assert(skewed.getAs[Double]("gini") === 0.81)
    assert(skewed.getAs[Double]("top10pct_share") === 0.91)
  }
}
