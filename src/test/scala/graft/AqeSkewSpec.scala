package graft

import org.apache.spark.sql.functions._

/** Pins WHEN AQE's skew-join handling suffices and when hand-salting
  * (`join_salted`) is still needed — the round-14 verdict's
  * documentation ask. A deliberately skewed sort-merge join (one key
  * carrying ~98% of the fact rows) runs twice under thresholds scaled
  * to the fixture; with skewJoin enabled the final adaptive plan must
  * SPLIT the hot partition (visible as a skew-marked AQEShuffleRead /
  * more shuffle-read tasks), with it disabled the hot partition stays
  * whole. Results are identical either way — AQE is a physical
  * re-plan, which is exactly why it's the FIRST line of defense at
  * 100 TB: no query rewrite, no oracle-visible change. Hand-salting
  * remains necessary only where AQE cannot reach: a skewed
  * AGGREGATION (no join to split — `agg_salted`'s case), or a
  * stateful/streaming key where the skew is in state, not shuffle
  * blocks. That boundary is recorded in BASELINE.md.
  */
class AqeSkewSpec extends SparkSpecBase {

  private def runSkewJoin(skewOn: Boolean): (Long, String) = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewOn.toString)
      // thresholds scaled to the fixture: the hot partition (~2 MB)
      // must read as skewed next to the 64 KB advisory size
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "131072")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "65536")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        "false")
      // force a sort-merge join: skew splitting applies to SMJ/SHJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      val fact = spark.range(0, 200000).select(
        when($"id" < 196000, lit(0L))
          .otherwise(pmod($"id", lit(63)) + 1).as("k"),
        $"id".as("v"))
      val dim = spark.range(0, 64).select($"id".as("k"), ($"id" * 7).as("w"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS plan (count() would spawn its own QueryExecution
      // and leave the join's adaptive plan unfinalized)
      val n = joined.collect().length.toLong
      (n, joined.queryExecution.executedPlan.toString)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition; results identical with it off") {
    val (nOn, planOn) = runSkewJoin(skewOn = true)
    val (nOff, planOff) = runSkewJoin(skewOn = false)
    assert(nOn === 200000L && nOff === 200000L,
      "skew handling must never change results")
    val skewMarked = planOn.linesIterator
      .exists(l => l.contains("AQEShuffleRead") && l.contains("skewed"))
    assert(skewMarked,
      s"skewJoin=on must split the hot partition; plan was:\n$planOn")
    val skewMarkedOff = planOff.linesIterator
      .exists(l => l.contains("AQEShuffleRead") && l.contains("skewed"))
    assert(!skewMarkedOff,
      "with skewJoin off the hot partition must stay whole")
  }
}
