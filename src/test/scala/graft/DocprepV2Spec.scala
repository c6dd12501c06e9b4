package graft

import org.apache.spark.sql.functions._

/** Reconciliation proofs for `pipeline_docprep_v2`: every attributed
  * exit must agree with the standalone catalog op that owns the rule —
  * the report is an OBSERVATION of the stages, so a count that drifts
  * from its stage is a bug in the report, not a policy choice.
  */
class DocprepV2Spec extends SparkSpecBase {

  private lazy val statuses =
    ops.Dedup.docPrepV2Statuses(spark, sf).cache()

  private def ids(df: org.apache.spark.sql.DataFrame, col0: String) =
    df.select(col(col0)).collect().map(_.getLong(0)).toSet

  test("report equals the per-doc statuses aggregated; statuses partition the corpus") {
    import spark.implicits._
    val nDocs = Tables.documents(spark, sf).count()
    assert(statuses.count() === nDocs, "every document gets exactly one status")
    val report = SparkEntry.queries("pipeline_docprep_v2")(spark, sf).collect()
    val bySrc = statuses.groupBy($"source", $"status").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- report) {
      val src = r.getString(0)
      def c(st: String) = bySrc.getOrElse((src, st), 0L)
      assert(r.getLong(1) ===
        c("classifier_fail") + c("exact_dup") + c("near_dup") +
          c("semantic_dup") + c("contaminated") + c("kept"))
      assert(r.getLong(2) === c("classifier_fail"))
      assert(r.getLong(3) === c("exact_dup"))
      assert(r.getLong(4) === c("near_dup"))
      assert(r.getLong(5) === c("semantic_dup"))
      assert(r.getLong(6) === c("contaminated"))
      assert(r.getLong(7) === c("kept"))
    }
  }

  test("classifier_fail set IS quality_classifier's keep=false set") {
    import spark.implicits._
    val fails = ids(statuses.filter($"status" === "classifier_fail"), "doc_id")
    val clsFails = ids(SparkEntry.queries("quality_classifier")(spark, sf)
      .filter(!$"keep"), "doc_id")
    assert(fails === clsFails)
  }

  test("semantic_dup attribution reconciles with semantic_dedup's drop set") {
    import spark.implicits._
    val survivors = ids(
      SparkEntry.queries("semantic_dedup")(spark, sf), "vec_id")
    val all = ids(Tables.embeddings(spark, sf).select($"vec_id"), "vec_id")
    val fullDrop = all -- survivors
    val attributed = ids(statuses.filter($"status" === "semantic_dup"), "doc_id")
    // attributed semantic_dups are exactly the full drop set minus docs
    // that exited earlier in the chain (precedence)
    assert(attributed.subsetOf(fullDrop))
    val earlier = ids(statuses.filter(
      $"status".isin("classifier_fail", "exact_dup", "near_dup")), "doc_id")
    assert((fullDrop -- earlier) === attributed)
  }

  test("contaminated attribution reconciles with the semantic contamination flags") {
    import spark.implicits._
    val flagged = ids(
      SparkEntry.queries("text_contamination_semantic")(spark, sf)
        .filter($"flagged"), "doc_id")
    val attributed = ids(statuses.filter($"status" === "contaminated"), "doc_id")
    assert(attributed.subsetOf(flagged))
    val earlier = ids(statuses.filter($"status".isin(
      "classifier_fail", "exact_dup", "near_dup", "semantic_dup")), "doc_id")
    assert((flagged -- earlier) === attributed)
    // and nothing kept is flagged or semantically dropped
    val kept = ids(statuses.filter($"status" === "kept"), "doc_id")
    assert((kept & flagged).isEmpty)
  }
}
