package graft

import org.apache.spark.sql.functions._

/** Pins `corpus_mix_temperature`'s α = 0.5 rebalance: the released
  * shares are a probability vector, share ORDER is preserved (the
  * power map is monotone), and the temperature actually flattens the
  * mix — the lowest-resource language is oversampled (epochs > 1),
  * the highest-resource one undersampled.
  */
class MixTemperatureSpec extends SparkSpecBase {

  test("sample shares form a probability vector and preserve share order") {
    val rows = SparkEntry.queries("corpus_mix_temperature")(spark, sf)
      .collect()
    assert(rows.length > 1, "fixture needs at least two languages")
    val total = rows.map(_.getDouble(5)).sum
    assert(math.abs(total - 1.0) < 1e-4,
      s"sample shares must sum to ~1, got $total")
    val byToken = rows.sortBy(_.getDouble(3))
    assert(byToken.map(_.getDouble(5)).sameElements(
      byToken.map(_.getDouble(5)).sorted),
      "p -> p^0.5 is monotone: sample-share order must match token-share order")
  }

  test("temperature flattens skew: tail oversampled, head undersampled") {
    val rows = SparkEntry.queries("corpus_mix_temperature")(spark, sf)
      .collect().sortBy(_.getDouble(3))
    val lo = rows.head
    val hi = rows.last
    assert(lo.getDouble(6) > 1.0,
      s"lowest-share language ${lo.getString(0)} must get epochs > 1")
    assert(hi.getDouble(6) < 1.0,
      s"highest-share language ${hi.getString(0)} must get epochs < 1")
    // the rebalance compresses the ratio between head and tail
    val before = hi.getDouble(3) / lo.getDouble(3)
    val after = hi.getDouble(5) / lo.getDouble(5)
    assert(after < before, s"temperature must compress skew ($after vs $before)")
  }
}
