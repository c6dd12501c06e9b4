package graft
import org.apache.spark.sql.SparkSession
object SpotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hot = Seq("dedup_embedding", "dedup_minhash", "dedup_ngram", "dedup_simhash", "ann_bruteforce", "ann_lsh", "dedup_exact")
    hot.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name%-18s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
