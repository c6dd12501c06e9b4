package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.concurrent.TrieMap

/** Local diagnosis tool: runs one catalog query with a per-job
  * listener, printing each Spark job's wall-clock and callsite so we
  * can see whether an op's cost is job-count orchestration floor or
  * data movement. Not part of the driver contract. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = if (args.nonEmpty) args(0) else "graph_leiden"
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.properties match {
          case null => ""
          case p => Option(p.getProperty("callSite.short")).getOrElse("")
        }
        starts(js.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.get(je.jobId).foreach { case (t0, site) =>
          val sec = (System.nanoTime() - t0) / 1e9
          if (sec > 0.02)
            println(f"  job ${je.jobId}%4d ${sec}%7.3f s  $site")
        }
      }
    })
    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      println(s"=== run $i of $name ===")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(300)
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
