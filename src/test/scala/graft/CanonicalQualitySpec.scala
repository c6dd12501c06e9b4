package graft

import org.apache.spark.sql.functions._

/** `dedup_canonical_quality` must pick a DIFFERENT survivor than the
  * longest-member policy when the longer near-dup is worse: the
  * planted pair is a clean document and the same text with digit junk
  * appended — longer (so `dedup_canonical` keeps it) but digit-heavy
  * (so the classifier scores it lower and the quality policy keeps
  * the clean one).
  */
class CanonicalQualitySpec extends SparkSpecBase {

  test("quality survivor beats the longest-member proxy on junk-padded dups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canonq").toString
    val clean = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far into the quiet green forest where it rests by a stream " +
      "of clear water under tall old trees near soft moss and light") * 2
    val padded = clean + " 4816230957 1092837465 5647382910 1029384756"
    val other = "completely different text about ships and harbors and " +
      "long voyages across the open sea with heavy cargo and calm wind"
    val docs = Seq((1L, clean), (2L, padded), (3L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val byQuality = SparkEntry.queries("dedup_canonical_quality")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(byQuality(1L)._1 === byQuality(2L)._1,
      "planted near-dups failed to land in one cluster — adjust the fixture")
    assert(byQuality(1L) === (1L, 1L), s"clean doc should survive: $byQuality")
    assert(byQuality(2L)._2 === 0L, "junk-padded dup must be dropped")
    assert(byQuality(3L) === (3L, 1L), "singleton keeps itself")

    val byLength = SparkEntry.queries("dedup_canonical")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byLength(1L) === 2L && byLength(2L) === 2L,
      "longest-member policy should pick the padded doc — the divergence " +
        "this op exists for")
  }

  test("dedup_soft: full coverage, canonical-consistent clusters, exact coin") {
    import graft.functions.TextFns.hash60
    val soft = SparkEntry.queries("dedup_soft")(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(soft.count() === docs, "one row per corpus document")
    // singletons always keep; the coin is exactly the documented rule
    assert(soft.filter(col("csize") === 1 && !col("keep")).count() === 0)
    val coin =
      hash60(concat(lit("soft:"), col("doc_id").cast("string"))) % 1000000L
    assert(soft.filter(col("keep") =!=
      (coin < expr("1000000 div csize"))).count() === 0)
    // same partition as dedup_canonical (both run the bounded
    // propagation over the same pair graph)
    val can = SparkEntry.queries("dedup_canonical")(spark, sf)
      .select(col("doc_id"), col("cluster_id").as("c2"))
    assert(soft.join(can, "doc_id")
      .filter(col("cluster_id") =!= col("c2")).count() === 0)
    // csize really is the cluster's member count
    val sz = soft.groupBy("cluster_id").count()
    assert(soft.join(sz, "cluster_id")
      .filter(col("csize") =!= col("count")).count() === 0)
    soft.unpersist()
  }
}
