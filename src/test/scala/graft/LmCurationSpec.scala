package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 LM-curation trio — unigram-LM
  * scoring, cross-doc duplicate spans, DSIR importance weighting. The
  * DuckDB oracle pins exact values on testdata; these pin the
  * PROPERTIES on inputs where they actually engage (testdata's 31-term
  * vocabulary never exceeds the 2048 LM vocab cap, so the OOV path and
  * the vocab boundary only exercise on a synthetic corpus).
  */
class LmCurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("text_span_rewrite reconciles with the excision manifest per doc") {
    val manifest = SparkEntry.queries("text_span_excise")(spark, sf)
      .groupBy("doc_id").agg(sum("span_tokens").as("m_removed"))
    val rw = SparkEntry.queries("text_span_rewrite")(spark, sf).cache()
    // accounting: before = after + removed, and removed matches the
    // manifest's span totals exactly (0 for untouched docs)
    assert(rw.filter(col("n_before") =!=
      col("n_after") + col("n_removed")).count() === 0)
    val j = rw.join(manifest, Seq("doc_id"), "left")
    assert(j.filter(coalesce(col("m_removed"), lit(0L)) =!=
      col("n_removed")).count() === 0,
      "per-doc removed tokens must equal the manifest's span totals")
    // untouched docs keep their full token stream bit-for-bit
    val fullDigest = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(array_join(
        graft.functions.TextFns.tokens(col("text")), " ")).as("fd"))
    assert(rw.filter(col("n_removed") === 0).join(fullDigest, "doc_id")
      .filter(col("clean_digest") =!= col("fd")).count() === 0)
    rw.unpersist()
  }

  test("rewrite reconciles with ExactSubstr keep-one (per-gram rule + caveat)") {
    // the rule's two testable halves, per spanExcise's scaladoc:
    // SOUNDNESS — every removed position lies inside some cross-doc-
    // duplicated gram's window (the rewrite never deletes unique
    // content); and the documented CAVEAT — keep-one holds per GRAM,
    // so an overlapping DIFFERENT gram's span may clip a kept
    // occurrence: on this fixture exactly one duplicated gram loses
    // all fully-surviving windows that way (pinned, so a semantics
    // change that widens or narrows the caveat trips the spec).
    graft.expressions.GraftFunctions.ensure(spark)
    val docs = Tables.documents(spark, sf)
    val occ = docs
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextFns.wordShingles("w", 8)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        md5(col("col")).as("h"))
      .cache()
    val dup = occ.select(col("h"), col("doc_id")).distinct()
      .groupBy("h").count().filter(col("count") >= 2).select(col("h"))
    val removedPos = SparkEntry.queries("text_span_excise")(spark, sf)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("rp"))
      .cache()
    val dupWindows = occ.join(dup, "h")
    val unsound = removedPos.join(dupWindows,
        removedPos("doc_id") === dupWindows("doc_id") &&
          col("rp").between(col("p"), col("p") + 7), "left_anti")
      .count()
    assert(unsound === 0,
      s"$unsound removed positions lie outside every duplicated gram window")
    val clipped = occ.join(removedPos,
        occ("doc_id") === removedPos("doc_id") &&
          col("rp").between(col("p"), col("p") + 7), "left_semi")
    val surviving = occ.exceptAll(clipped).select(col("h")).distinct()
    val lost = dup.join(surviving, Seq("h"), "left_anti").count()
    assert(lost === 1,
      s"overlap-caveat clips drifted: $lost dup grams lost all full windows")
    occ.unpersist(); removedPos.unpersist()
  }

  test("text_lm_score: testdata has no OOV (31 terms << vocab) and CE is bounded") {
    val r = SparkEntry.queries("text_lm_score")(spark, sf).cache()
    assert(r.count() === 500)
    assert(r.agg(sum("n_oov")).head.getLong(0) === 0L)
    // every per-token surprise is <= the OOV bound ln(N + V + 1)
    val n = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens(col("text")))).count()
    val bound = math.log(n.toDouble + 2048 + 1)
    assert(r.filter(col("cross_entropy") <= 0 ||
      col("cross_entropy") > bound).count() === 0)
    r.unpersist()
  }

  test("lmScore: past the vocab cap, OOV docs exist and score strictly worse") {
    // 3000 docs "common tNNNN": 3001 distinct terms, vocab keeps
    // "common" + 2047 singletons; the 953 excluded singletons are OOV.
    val docs = spark.range(3000)
      .select(col("id").as("doc_id"),
        concat(lit("common t"), col("id")).as("text"))
    val r = ops.TextAnalysis.lmScore(spark, docs).cache()
    assert(r.count() === 3000)
    assert(r.filter(col("n_oov") === 1).count() === 3000 - 2047)
    // all docs are 2 tokens; OOV prob < singleton prob, so every
    // OOV doc has strictly higher cross-entropy than every vocab doc
    val maxVocab = r.filter(col("n_oov") === 0)
      .agg(max("cross_entropy")).head.getDouble(0)
    val minOov = r.filter(col("n_oov") === 1)
      .agg(min("cross_entropy")).head.getDouble(0)
    assert(minOov > maxVocab)
    r.unpersist()
  }

  test("lmBigram: rare word order scores worse; past the pair cap, backoff engages") {
    // 20 copies of one 6-token sentence plus one reversed copy. The
    // model trains on the whole corpus (pair cap 4096 >> distinct
    // pairs), so even the reversed doc's pairs are IN the table — with
    // count 1 against the natural pairs' 20/21. Unigram CE is identical
    // by construction (same token multiset); only the bigram order
    // statistics separate them.
    val docs = spark.range(20)
      .select(col("id").as("doc_id"), lit("the cat sat on a mat").as("text"))
      .union(Seq((100L, "mat a on sat cat the")).toDF("doc_id", "text"))
    val r = ops.TextAnalysis.lmBigram(spark, docs).cache()
    assert(r.count() === 21)
    assert(r.filter(col("n_backoff") =!= 0).count() === 0)
    val ceNat = r.filter(col("doc_id") === 0).head.getAs[Double]("cross_entropy")
    val ceScr = r.filter(col("doc_id") === 100).head.getAs[Double]("cross_entropy")
    assert(ceScr > ceNat)
    r.unpersist()

    // The backoff path needs the cap to bite: 5000 docs "x tN" make
    // 5000 distinct equal-count pairs; the table keeps 4096, so 904
    // docs back off — and every backoff doc scores strictly worse than
    // every table doc (0.4-penalized unigram < add-one conditional).
    val caps = spark.range(5000)
      .select(col("id").as("doc_id"), concat(lit("x t"), col("id")).as("text"))
    val c = ops.TextAnalysis.lmBigram(spark, caps).cache()
    assert(c.filter(col("n_backoff") === 1).count() === 5000 - 4096)
    val maxTab = c.filter(col("n_backoff") === 0)
      .agg(max("cross_entropy")).head.getDouble(0)
    val minBo = c.filter(col("n_backoff") === 1)
      .agg(min("cross_entropy")).head.getDouble(0)
    assert(minBo > maxTab)
    c.unpersist()
  }

  test("text_dup_spans: n_spans == n_tokens - 7 for every testdata doc") {
    val spans = SparkEntry.queries("text_dup_spans")(spark, sf)
    val toks = SparkEntry.queries("text_stats")(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
    val bad = spans.join(toks, "doc_id")
      .filter(col("n_spans") =!= col("n_tokens") - 7 ||
        col("n_dup_spans") > col("n_spans") || col("n_dup_spans") < 0)
    assert(bad.count() === 0)
    assert(spans.count() ===
      toks.filter(col("n_tokens") >= 8).count())
  }

  test("dupSpans: shared span counted in both docs, unique doc scores zero") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared alpha beta"), // spans 1..3 dup (the shared window)
      (2L, s"prefix $shared"),     // spans 2..3 dup
      (3L, "q w e r t y u i o p") // 3 spans, none shared
    ).toDF("doc_id", "text")
    val r = ops.TextAnalysis.dupSpans(spark, docs)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2))).toMap
    // doc1: 10 tokens -> 3 spans; the span starting at "one" is dup
    // (appears in doc2 at offset 2); doc2 likewise shares exactly one
    assert(r(1L) === (3L, 1L))
    assert(r(2L) === (2L, 1L))
    assert(r(3L) === (3L, 0L))
  }

  test("text_source_terms: a planted source-exclusive word tops its source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("srcterms").toString
    val filler = "alpha beta gamma delta epsilon"
    val docs = (1L to 6L).map(i => (i, s"$filler zebra", "feedA")) ++
      (7L to 12L).map(i => (i, s"$filler", "feedB"))
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_source_terms")(spark, dir).cache()
    val topA = out.filter(col("source") === "feedA" && col("rank") === 1)
      .head
    assert(topA.getString(2) === "zebra",
      "the source-exclusive term must rank first for its feed")
    assert(topA.getLong(3) === 6L)
    // zebra never qualifies for feedB (zero occurrences there); the
    // shared filler terms score lift ~1 and rank below zebra in feedA
    assert(out.filter(col("source") === "feedB" && col("term") === "zebra")
      .count() === 0)
    assert(out.filter(col("lift") <= 0 || col("n_in_source") < 5)
      .count() === 0)
    // ranks are dense 1..k per source
    val ranks = out.groupBy("source")
      .agg(min("rank").as("lo"), max("rank").as("hi"),
        count(lit(1)).as("n")).collect()
    assert(ranks.forall(r => r.getInt(1) === 1 &&
      r.getInt(2) === r.getLong(3).toInt))
    out.unpersist()
  }

  test("spanExcise: keep-one-copy, overlap merge, and gap preservation") {
    val block = "one two three four five six seven eight"
    val tail8 = "two three four five six seven eight nine"
    val docs = Seq(
      (1L, s"$block nine ten"),   // 10 tokens, the corpus-first copy
      (2L, s"$block nine ten"),   // exact dup of doc 1
      (3L, s"xx yy $tail8 qq"),   // shares doc 1's tokens 2..9 only
      // two disjoint shared blocks around differing middles (vs doc 5)
      (4L, s"$block u1 u2 u3 p1 p2 p3 p4 p5 p6 p7 p8"),
      (5L, s"$block v1 v2 v3 p1 p2 p3 p4 p5 p6 p7 p8")
    ).toDF("doc_id", "text")
    val r = ops.TextAnalysis.spanExcise(spark, docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    // doc 1 is first everywhere -> keeps every copy (no rows); doc 2's
    // three overlapping dup windows merge to ONE maximal span [1,10];
    // doc 3 excises exactly its [3,10] window; docs 4/5 share the
    // leading block (whose corpus-first copy is DOC 1's, so both
    // excise it) and the trailing p-block (first in doc 4, so only
    // doc 5 excises it) but NOT the middles — doc 5's two spans stay
    // DISJOINT with the gap tokens 9..11 preserved
    assert(r === Seq(
      (2L, 1L, 10L, 10L),
      (3L, 3L, 10L, 8L),
      (4L, 1L, 8L, 8L),
      (5L, 1L, 8L, 8L),
      (5L, 12L, 19L, 8L)), r.toString)
  }

  test("text_span_excise: manifests are disjoint, in-bounds, and keep-one holds corpus-wide") {
    val ex = SparkEntry.queries("text_span_excise")(spark, sf).cache()
    // spans are 1-based, at least SpanK wide, and per-doc disjoint
    // with a gap (islands merged adjacents, so consecutive spans must
    // be separated by at least one kept token)
    assert(ex.filter(col("span_start") < 1 ||
      col("span_tokens") < 8 ||
      col("span_tokens") =!= col("span_end") - col("span_start") + 1)
      .count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val overlaps = ex.withColumn("pe", lag(col("span_end"), 1).over(w))
      .filter(col("pe").isNotNull && col("span_start") <= col("pe") + 1)
    assert(overlaps.count() === 0, "maximal spans must be disjoint, non-adjacent")
    // every excised doc is one text_dup_spans flags, never a clean doc
    val flagged = SparkEntry.queries("text_dup_spans")(spark, sf)
      .filter(col("n_dup_spans") > 0).select("doc_id")
    assert(ex.select("doc_id").distinct()
      .join(flagged, Seq("doc_id"), "left_anti").count() === 0)
    ex.unpersist()
  }

  test("bpeMerges: greedy non-overlap within runs, round 2 counts merged symbols") {
    val docs = Seq(
      (1L, "a a a b a b"), // (a,a) run of 2 merges ONCE (greedy non-overlap)
      (2L, "x y x y")
    ).toDF("doc_id", "text")
    val r = ops.TextAnalysis.bpeMerges(spark, docs)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    // round 1: (a,a), (a,b), (x,y) all count 2 -> tie-break picks (a,a);
    // the a-a-a run merges once, leaving ["a a", a, b, a, b]
    // round 2: (a,b) and (x,y) tie at 2 -> (a,b)
    assert(r.toSeq === Seq((1L, "a a", 2L), (2L, "a b", 2L)))
  }

  test("bpe_apply is token-identical to the gaps-and-islands window rewrite") {
    import graft.functions.TextFns
    graft.expressions.GraftFunctions.ensure(spark)
    // real testdata, adversarial merge: the corpus's most frequent pair
    // (guaranteeing overlapping runs somewhere in 31-token vocab text)
    val docs = Tables.documents(spark, sf)
    val toks = docs
      .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
    val top = ops.TextAnalysis.bpePairs(toks).groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("a").asc, col("b").asc).limit(1)
    val viaWindow = ops.TextAnalysis.bpeMergeRound(toks, top)
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)").as("w"))
    val viaExpr = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w0"))
      .crossJoin(broadcast(top.select(
        concat(col("a"), lit(""), col("b")).as("mg"))))
      .select(col("doc_id"), expr("bpe_apply(w0, array(mg))").as("w"))
    val diffs = viaWindow.join(viaExpr.withColumnRenamed("w", "w2"), "doc_id")
      .filter(not(col("w") <=> col("w2"))).count()
    assert(diffs === 0)
  }

  test("bpeEncode applies EVERY merge: counts and compression are exact") {
    val docs = Seq(
      (1L, "a a a b a b"), // r1 merges (a,a) once; r2 merges (a,b) twice
      (2L, "x y x y")      // matches no learned merge — unchanged
    ).toDF("doc_id", "text")
    val r = ops.TextAnalysis.bpeEncodeOf(spark, docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    // doc1: 6 → [aa, a, b, a, b] → [aa, ab, ab] = 3 (compression 0.5)
    assert(r.toSeq === Seq((1L, 6L, 3L, 0.5), (2L, 4L, 4L, 1.0)))
  }

  test("bpe_train_merges emits one adopted merge per round on testdata") {
    val r = SparkEntry.queries("bpe_train_merges")(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(2)))
    assert(r.map(_._1).toSeq === Seq(1L, 2L))
    assert(r.forall(_._2 > 0))
  }

  test("dsir_select: scores every doc, and target-source docs average higher") {
    val r = SparkEntry.queries("dsir_select")(spark, sf).cache()
    assert(r.count() === 500)
    val bySrc = r.join(
      Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(avg("lw_avg").as("m"))
    val tgt = bySrc.filter(col("source") === "src0").head.getDouble(1)
    val rest = bySrc.filter(col("source") =!= "src0")
      .agg(avg("m")).head.getDouble(0)
    assert(tgt > rest)
    r.unpersist()
  }

  test("dsirScore: a disjoint-vocabulary target separates keep cleanly") {
    val docs = (
      (0 until 20).map(i => (i.toLong, "src0", "alpha beta gamma delta")) ++
        (20 until 80).map(i => (i.toLong, "web", "zulu yankee xray whiskey"))
      ).toDF("doc_id", "source", "text")
    val r = ops.Curation.dsirScore(spark, docs).cache()
    assert(r.filter(col("doc_id") < 20 && !col("keep")).count() === 0)
    assert(r.filter(col("doc_id") >= 20 && col("keep")).count() === 0)
    r.unpersist()
  }

  test("bpe_encode_from_store: parquet merge store reproduces the catalog op") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val store = ops.TextAnalysis.bpeMergeStore(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("bpestore").toString
    store.write.parquet(s"$dir/merges")
    val fromStore = ops.TextAnalysis.bpeEncodeFromMerges(spark, docs,
      spark.read.parquet(s"$dir/merges"))
    val inQuery = SparkEntry.queries("bpe_encode_from_store")(spark, sf)
    assert(fromStore.collect().toSeq === inQuery.collect().toSeq)
    val direct = SparkEntry.queries("bpe_encode")(spark, sf)
    assert(fromStore.collect().toSeq === direct.collect().toSeq,
      "one-pass apply of the full rank-ordered merge list must equal " +
        "the per-round rewrite")
  }

  test("the encode-from-store plan is shuffle-free before the output sort") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val store = ops.TextAnalysis.bpeMergeStore(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("bpeplan").toString
    store.write.parquet(s"$dir/merges")
    val plan = ops.TextAnalysis.bpeEncodeFromMerges(spark, docs,
        spark.read.parquet(s"$dir/merges"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode must be one row-local pass, no keyed shuffle:\n$plan")
  }
}
