package graft

import org.apache.spark.sql.functions._

/** Proves `rank_bm25_from_store`'s production contract — the lexical
  * analogue of IncrementalDedupSpec's signature store: the persisted
  * index (postings + df + stats) round-trips through parquet with
  * row-identical retrieval output, the from-store plan never touches
  * the corpus text, and scoring from the store is the SAME ranking the
  * per-call `rank_bm25` computes.
  */
class LexicalIndexSpec extends SparkSpecBase {

  private def storeDirs(): (String, String, String) = {
    val (postings, dfAll, stats) =
      ops.TextAnalysis.lexicalIndex(spark, Tables.documents(spark, sf))
    val dir = java.nio.file.Files.createTempDirectory("lexstore").toString
    postings.write.mode("overwrite").parquet(s"$dir/postings")
    dfAll.write.mode("overwrite").parquet(s"$dir/df")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    (s"$dir/postings", s"$dir/df", s"$dir/stats")
  }

  private def queriesDf() = {
    import spark.implicits._
    Seq(("q1", "hash"), ("q1", "join"), ("q1", "scan"),
      ("q2", "sort"), ("q2", "merge"), ("q2", "stream"))
      .toDF("query_id", "term")
  }

  test("retrieval from a parquet round-tripped index equals the in-query op") {
    val (p, f, st) = storeDirs()
    val fromStore = ops.TextAnalysis.bm25FromStore(spark,
      spark.read.parquet(p), spark.read.parquet(f), spark.read.parquet(st),
      queriesDf())
    val inQuery = SparkEntry.queries("rank_bm25_from_store")(spark, sf)
    assert(fromStore.count() === inQuery.count())
    assert(fromStore.exceptAll(inQuery).isEmpty &&
      inQuery.exceptAll(fromStore).isEmpty)
  }

  test("the from-store plan reads ONLY the store — no documents scan") {
    val (p, f, st) = storeDirs()
    val fromStore = ops.TextAnalysis.bm25FromStore(spark,
      spark.read.parquet(p), spark.read.parquet(f), spark.read.parquet(st),
      queriesDf())
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(!plan.contains("documents"),
      "retrieval must not re-scan the corpus text")
    assert(plan.contains("postings"), "retrieval must read the stored postings")
  }

  test("lexical_index_merge: merged store equals a full rebuild, frame by frame") {
    val docs = Tables.documents(spark, sf)
    val oldSide = docs.filter(!ops.TextAnalysis.isLexBatch(col("doc_id")))
    val incSide = docs.filter(ops.TextAnalysis.isLexBatch(col("doc_id")))
    assert(incSide.count() > 0 && oldSide.count() > 0,
      "the fixture must exercise both sides of the ingest split")
    val (sp, sdf, sst) = ops.TextAnalysis.lexicalIndex(spark, oldSide)
    val (ip, idf, ist) = ops.TextAnalysis.lexicalIndex(spark, incSide)
    val (p, f, st) =
      ops.TextAnalysis.lexicalIndexMerge(sp, sdf, sst, ip, idf, ist)
    val (rp, rf, rst) = ops.TextAnalysis.lexicalIndex(spark, docs)
    assert(p.exceptAll(rp).isEmpty && rp.exceptAll(p).isEmpty,
      "merged postings must equal rebuilt postings exactly")
    assert(f.exceptAll(rf).isEmpty && rf.exceptAll(f).isEmpty,
      "merged df must equal rebuilt df exactly")
    assert(st.collect().toSeq === rst.collect().toSeq,
      "merged corpus stats must equal rebuilt stats exactly")
  }

  test("lexical_index_merge: store from parquet + increment-only tokenize " +
    "gives identical retrieval") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val (sp, sdf, sst) = ops.TextAnalysis.lexicalIndex(spark,
      docs.filter(!ops.TextAnalysis.isLexBatch(col("doc_id"))))
    val dir = java.nio.file.Files.createTempDirectory("lexmerge").toString
    sp.write.parquet(s"$dir/postings")
    sdf.write.parquet(s"$dir/df")
    sst.write.parquet(s"$dir/stats")
    val (ip, idf, ist) = ops.TextAnalysis.lexicalIndex(spark,
      docs.filter(ops.TextAnalysis.isLexBatch(col("doc_id"))))
    val (p, f, st) = ops.TextAnalysis.lexicalIndexMerge(
      spark.read.parquet(s"$dir/postings"), spark.read.parquet(s"$dir/df"),
      spark.read.parquet(s"$dir/stats"), ip, idf, ist)
    val fromStore = ops.TextAnalysis.bm25FromStore(spark, p, f, st,
      Seq(("m1", "filter"), ("m1", "window"), ("m1", "vector"))
        .toDF("query_id", "term"))
      .orderBy($"query_id", $"rk")
    val inQuery = SparkEntry.queries("lexical_index_merge")(spark, sf)
    assert(fromStore.collect().toSeq === inQuery.collect().toSeq,
      "merging a parquet store must reproduce the catalog op exactly")
  }

  test("from-store q1 ranking equals rank_bm25's head — same scores, same order") {
    import spark.implicits._
    val q1 = SparkEntry.queries("rank_bm25_from_store")(spark, sf)
      .filter($"query_id" === "q1").orderBy($"rk")
      .select($"doc_id", $"n_terms", $"score")
      .collect().toSeq
    val direct = SparkEntry.queries("rank_bm25")(spark, sf)
      .limit(q1.length)
      .select($"doc_id", $"n_terms", $"score")
      .collect().toSeq
    assert(q1 === direct,
      "stored-index scoring must reproduce the per-call BM25 ranking")
  }
}
