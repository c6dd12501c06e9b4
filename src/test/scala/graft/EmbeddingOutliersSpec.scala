package graft

/** Pins `embedding_outliers` against a driver-side exact recomputation:
  * the same DECIMAL-exact per-(label, dim) mean, the same strict-left-
  * fold normalize/dot as [[graft.expressions.VecDot]], the same
  * (cosine asc, vec_id asc) top-5 — so a drift in any link of the
  * centroid recipe (cast, fold order, tie-break) fails loudly here
  * before it reaches the cross-engine hash gate.
  */
class EmbeddingOutliersSpec extends SparkSpecBase {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def norm(a: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(dot(a, a)); a.map(_ / nrm)
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("outlier ranks equal a driver-side exact recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .as[(Long, Int, Array[Double])].collect()
    val dims = rows.head._3.length
    val naive = rows.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      val cent = Array.tabulate(dims) { j =>
        val s = vs.foldLeft(BigDecimal(0)) { (acc, v) =>
          acc + BigDecimal(v._3(j)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        }
        s.toDouble / vs.length
      }
      val nc = norm(cent)
      vs.map { case (id, _, e) => (label, id, dot(norm(e), nc)) }
        .sortBy { case (_, id, c) => (c, id) }
        .take(5).zipWithIndex
        .map { case ((l, id, c), i) => (l, i + 1, id, r6(c)) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("embedding_outliers")(spark, sf)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got === naive)
  }

  test("every label reports exactly min(5, label size) rows, ranked 1..k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rep = SparkEntry.queries("embedding_outliers")(spark, sf)
    val sizes = Tables.embeddings(spark, sf).groupBy($"label")
      .agg(count(lit(1)).as("n"))
    val perLabel = rep.groupBy($"label")
      .agg(count(lit(1)).as("k"), max($"rank").as("maxr"),
        min($"rank").as("minr"))
      .join(sizes, "label")
    assert(perLabel.filter($"k" =!= least($"n", lit(5L))).count() === 0)
    assert(perLabel.filter($"minr" =!= 1 || $"maxr" =!= $"k").count() === 0)
  }
}
