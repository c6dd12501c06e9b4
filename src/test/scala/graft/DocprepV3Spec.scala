package graft

import org.apache.spark.sql.functions._

/** Reconciliation proofs for `pipeline_docprep_v3` (the DocprepV2Spec
  * pattern): every attributed stage exit must agree with the
  * standalone catalog op that owns the rule — the gopher gate with
  * `text_gopher_rules`, the excised-token mass with
  * `text_span_rewrite`, the post-rewrite unigram counts with
  * `text_tokens_unigram` on untouched docs, and the temperature tail
  * with `corpus_mix_temperature`'s algebra.
  */
class DocprepV3Spec extends SparkSpecBase {
  import spark.implicits._

  private lazy val report =
    SparkEntry.queries("pipeline_docprep_v3")(spark, sf).cache()

  private lazy val gopher =
    SparkEntry.queries("text_gopher_rules")(spark, sf)
      .join(Tables.documents(spark, sf).select($"doc_id", $"lang"),
        "doc_id").cache()

  test("gopher exits equal text_gopher_rules' keep=false per lang") {
    val want = gopher.groupBy($"lang")
      .agg(sum(when(!$"keep", 1L).otherwise(0L)).as("f"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    report.collect().foreach { r =>
      val (f, n) = want(r.getString(0))
      assert(r.getLong(2) === f, s"${r.getString(0)} gopher_fail")
      assert(r.getLong(1) === n, s"${r.getString(0)} n_docs")
      assert(r.getLong(3) === n - f, s"${r.getString(0)} n_kept")
    }
  }

  test("excised tokens equal text_span_rewrite's n_removed over kept docs") {
    val keptIds = gopher.filter($"keep").select($"doc_id", $"lang")
    val want = SparkEntry.queries("text_span_rewrite")(spark, sf)
      .join(keptIds, "doc_id")
      .groupBy($"lang").agg(sum($"n_removed").as("rem"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    report.collect().foreach { r =>
      assert(r.getLong(4) === want.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)} tokens_excised")
    }
  }

  test("unigram counts equal text_tokens_unigram on untouched kept docs") {
    // docs with zero excised tokens re-tokenize to exactly the owning
    // op's count; per-lang totals then reconcile additively
    val untouched = SparkEntry.queries("text_span_rewrite")(spark, sf)
      .filter($"n_removed" === 0L).select($"doc_id")
    val keptUntouched = gopher.filter($"keep").select($"doc_id", $"lang")
      .join(untouched, "doc_id")
    val own = SparkEntry.queries("text_tokens_unigram")(spark, sf)
      .join(keptUntouched, "doc_id")
      .groupBy($"lang").agg(sum($"n_tokens_unigram").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // v3's per-lang unigram mass ≥ the untouched-doc mass, and for a
    // lang whose kept docs are ALL untouched, exactly equal
    val touchedLangs = SparkEntry.queries("text_span_rewrite")(spark, sf)
      .filter($"n_removed" > 0L)
      .join(gopher.filter($"keep").select($"doc_id", $"lang"), "doc_id")
      .select($"lang").distinct().collect().map(_.getString(0)).toSet
    report.collect().foreach { r =>
      val lang = r.getString(0)
      val mass = r.getLong(5)
      assert(mass >= own.getOrElse(lang, 0L), s"$lang unigram mass")
      if (!touchedLangs(lang))
        assert(mass === own.getOrElse(lang, 0L),
          s"$lang: all kept docs untouched, counts must match exactly")
    }
  }

  test("temperature tail is corpus_mix_temperature's algebra") {
    val rows = report.collect()
    val shares = rows.map(_.getDouble(7))
    assert(math.abs(shares.sum - 1.0) < 1e-4,
      "sample shares must sum to 1")
    rows.foreach { r =>
      val (ts, ss, ep) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      assert(math.abs(ep - ss / ts) < 1e-3,
        s"${r.getString(0)}: epochs must be sample_share/token_share")
    }
    // temperature flattens: below-average languages get epochs > 1
    rows.filter(_.getDouble(6) < 0.2).foreach(r =>
      assert(r.getDouble(8) > 1.0, s"${r.getString(0)} should oversample"))
  }
}
