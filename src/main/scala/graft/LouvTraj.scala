package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP scratch: multi-level Louvain per-round timing. */
object LouvTraj {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val T0 = System.nanoTime()
    val edges0 = ops.Graph.coOrderEdges(s, d).cache()
    var wedges = edges0.select($"src", $"dst", lit(1L).as("w"))
      .repartition($"src").sortWithinPartitions($"src").cache()
    val m = t("m")(wedges.agg(sum($"w")).head.getLong(0))
    for (level <- 1 to 3) {
      val deg = wedges.groupBy($"src").agg(sum($"w").as("k"))
        .withColumnRenamed("src", "node").cache()
      var ib = t(s"L$level ib") {
        val r = wedges.filter($"src" === $"dst").agg(sum($"w")).head
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      var sb = t(s"L$level sb")(deg.agg(sum($"k" * $"k")).head.getLong(0))
      var labels = t(s"L$level lab0")(
        deg.select($"node", $"node".as("label")).localCheckpoint())
      for (round <- 0 until 2) {
        val (nl, nM, nIb, nSb) = t(s"L$level r$round") {
          ops.Graph.louvainWeightedMove(s, wedges, deg, m, ib, sb, labels,
            level, round % 2)
        }
        println(s"    moves=$nM")
        labels = nl; ib = nIb; sb = nSb
      }
      if (level < 3) {
        wedges = t(s"L$level contract") {
          wedges
            .join(labels.select($"node".as("src"), $"label".as("ls")), "src")
            .join(labels.select($"node".as("dst"), $"label".as("ld")), "dst")
            .groupBy($"ls".as("src"), $"ld".as("dst"))
            .agg(sum($"w").as("w"))
            .repartition($"src").sortWithinPartitions($"src").cache()
        }
        wedges.count()
      }
    }
    println(f"[traj] total ${(System.nanoTime() - T0) / 1e9}%6.2f s")
    s.stop()
  }
}
