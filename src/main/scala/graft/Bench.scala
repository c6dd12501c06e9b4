package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every catalog query on the sf dir from
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Round-over-round comparability: queries run in SORTED name order
  * (never `Map` hash order, which shifts when entries are added) after
  * one untimed warmup query that absorbs JVM/JIT/codegen startup cost;
  * the cache is cleared between queries so no query is billed for (or
  * subsidized by) another query's cached frames.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Respect AQE's advisory partition size instead of maximizing
      // parallelism: small shuffles coalesce to few tasks (the Spark
      // docs' recommended setting; at scale the 64 MB advisory size
      // governs, so this never under-partitions big data).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // same TZ binding as Verify: event-time bucketing row counts must
      // not depend on the host's default zone
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = names.map { name =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
