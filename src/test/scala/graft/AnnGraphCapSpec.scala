package graft

import org.apache.spark.sql.{DataFrame, functions => F}

/** The graph-ANN family's scale pins: the navigation-graph build is
  * width-capped (the EmbSkewSpec/DedupSkewSpec convention applied to
  * the cell self-join), the persisted store round-trips, and the
  * store-fed walk agrees with the live-built one.
  */
class AnnGraphCapSpec extends SparkSpecBase {

  /** `n` IDENTICAL unit vectors — the adversarial geometry from the
    * round-16 review: every vector multi-probes into the same two
    * cells, so an uncapped build goes quadratic in n. */
  private def degenerate(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j < 8) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
  }

  private def centsOf(e: DataFrame, k: Int): DataFrame =
    e.orderBy(F.col("vec_id").asc).limit(k)
      .select(F.col("vec_id").as("cell"), F.col("ne").as("cv"))

  test("degenerate corpus: per-cell membership is hard-capped") {
    val e = ops.Similarity.normalize(spark, degenerate(ops.Similarity.BeamCellCap + 200))
    val sizes = ops.Similarity.navMembership(e, centsOf(e, 4))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.nonEmpty)
    assert(sizes.forall(_ <= ops.Similarity.BeamCellCap),
      s"cell sizes ${sizes.mkString(",")} exceed the cap")
  }

  test("degenerate corpus: adjacency stays linear in n, not quadratic") {
    val n = ops.Similarity.BeamCellCap + 200
    val e = ops.Similarity.normalize(spark, degenerate(n)).cache()
    val adj = ops.Similarity.navAdjacency(e, centsOf(e, 4))
    // top-degree prune + symmetrize: ≤ 2·n·degree edges even though
    // the uncapped pair set would be ~n²
    assert(adj.count() <= 2L * n * ops.Similarity.BeamDegree)
    e.unpersist(false)
  }

  test("cap does not bind on real testdata (assignment unchanged)") {
    val e = ops.Similarity.normalize(spark,
      spark.read.parquet(s"$sf/embeddings.parquet")).cache()
    val cents = centsOf(e, 16)
    val sizes = ops.Similarity.navMembership(e, cents)
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.max < ops.Similarity.BeamCellCap)
    e.unpersist(false)
  }

  /** Live recomputation of the incremental op's full flow (build from
    * raw vectors, walk, top-3 + n_cand) — no store involved. */
  private def liveIncremental(): Array[(Long, Int, Long, Any, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val all = ops.Similarity.normalize(spark,
      spark.read.parquet(s"$sf/embeddings.parquet"))
      .withColumn("is_new", graft.functions.TextFns.hash60(
        F.concat(F.lit("ing:"), F.col("vec_id").cast("string"))) % 10 === 0)
      .cache()
    val e = all.filter(!F.col("is_new")).select("vec_id", "ne").cache()
    val cells = math.max(16,
      math.floor(math.sqrt(e.count().toDouble)).toInt)
    val adj = ops.Similarity.navAdjacency(e, centsOf(e, cells))
      .localCheckpoint()
    val q = all.filter(F.col("is_new"))
      .select(F.col("vec_id").as("query_id"), F.col("ne").as("nq")).cache()
    val (beam, vis) = ops.Similarity.navWalk(q, centsOf(e, cells), adj,
      df => df.localCheckpoint(eager = false))
    val w = Window.partitionBy(F.col("query_id"))
      .orderBy(F.col("cosine").desc, F.col("cand_id").asc)
    val nc = vis.groupBy("query_id").agg(F.count(F.lit(1)).as("n_cand"))
    val out = beam.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= 3).join(nc, "query_id")
      .select(F.col("query_id"), F.col("rank"), F.col("cand_id"),
        graft.functions.Exact.roundHalfUp(F.col("cosine"), 6).as("cosine"),
        F.col("n_cand"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.get(3),
        r.getLong(4)))
    all.unpersist(false); e.unpersist(false); q.unpersist(false)
    out
  }

  test("store-fed incremental ≡ live-built (parquet round-trip)") {
    val got = SparkEntry.queries("ann_graph_incremental")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.get(3),
        r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got === liveIncremental().toSet)
  }

  test("shared walk: incremental's store queries are the ingest slice") {
    val inc = SparkEntry.queries("ann_graph_incremental")(spark, sf)
    val incIds = inc.select("inc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = ops.Similarity.normalize(spark,
      spark.read.parquet(s"$sf/embeddings.parquet"))
      .filter(graft.functions.TextFns.hash60(
        F.concat(F.lit("ing:"), F.col("vec_id").cast("string"))) % 10 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(incIds === expect)
    // linked neighbors come from the INDEXED corpus only
    val cands = inc.select("cand_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cands.intersect(expect).isEmpty)
  }
}
