package graft

import org.apache.spark.sql.functions._

/** Pins `split_leakage_report` to its two sources: the report is by
  * construction `dedup_minhash`'s pair set folded by the
  * `sample_split` assignment, so the pair tallies must reconcile
  * exactly with the former and the eval-doc counts must be consistent
  * with the latter.
  */
class SplitLeakageSpec extends SparkSpecBase {

  private lazy val rep =
    SparkEntry.queries("split_leakage_report")(spark, sf).collect()

  test("pair tallies reconcile exactly with dedup_minhash") {
    val exactPairs = SparkEntry.queries("dedup_minhash")(spark, sf).count()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === exactPairs)
  }

  test("classes are normalized, flags consistent, eval counts bounded") {
    for (r <- rep) {
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(a <= b, s"unnormalized class ($a, $b)")
      assert(r.getAs[Boolean]("leaky") === (a != b))
      assert(r.getAs[Double]("mean_jaccard") >= 0.8 - 1e-6,
        "folded pairs all passed the 0.8 gate")
      val ed = r.getAs[Long]("n_eval_docs")
      // each pair contributes at most 2 docs; a train-train class none
      assert(ed <= 2 * r.getAs[Long]("n_pairs"))
      if (a == "train" && b == "train") assert(ed === 0L)
    }
  }

  test("every eval doc in a cross pair is a real sample_split member") {
    // re-derive the contaminated eval docs independently and compare
    // totals: dedup_minhash pairs joined to sample_split, keep pairs
    // whose members land in different splits, count distinct non-train
    val pairs = SparkEntry.queries("dedup_minhash")(spark, sf)
    val splits = SparkEntry.queries("sample_split")(spark, sf)
    val dec = pairs
      .join(splits.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), "doc_b")
    val expected = dec
      .select(col("doc_a").as("doc"), col("sa").as("sp"),
        least(col("sa"), col("sb")).as("ca"),
        greatest(col("sa"), col("sb")).as("cb"))
      .unionByName(dec.select(col("doc_b").as("doc"), col("sb").as("sp"),
        least(col("sa"), col("sb")).as("ca"),
        greatest(col("sa"), col("sb")).as("cb")))
      .filter(col("sp") =!= "train")
      .select(col("ca"), col("cb"), col("doc")).distinct()
      .groupBy(col("ca"), col("cb")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for (r <- rep) {
      val k = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(expected.getOrElse(k, 0L) === r.getAs[Long]("n_eval_docs"),
        s"eval-doc count mismatch for $k")
    }
  }
}
