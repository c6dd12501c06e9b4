package graft

import org.apache.spark.sql.functions._

/** Proves the chunked coarse-assignment path (`assignCellsChunked` —
  * the multi-row packed codebook for K × dims beyond the ~2 MB
  * single-row bound) assigns bit-identically to the single-row fast
  * path, including tie-breaks across chunk boundaries. Run with a
  * deliberately tiny chunk so a testdata-sized codebook spans many
  * chunks.
  */
class ChunkedAssignSpec extends SparkSpecBase {

  test("chunked assignment equals single-row assignment, any chunk size") {
    import spark.implicits._
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
      .select($"vec_id", $"ne")
    val cents = e.filter($"vec_id" < 24)
      .select($"vec_id".as("cell"), $"ne".as("cv"))
    val fast = ops.Similarity.assignCells(e, cents)
      .select($"vec_id", $"cell")
    for (chunk <- Seq(1, 5, 7, 24, 1000)) {
      val chunked = ops.Similarity.assignCellsChunked(e, cents, chunk)
        .select($"vec_id", $"cell")
      assert(chunked.count() === fast.count(), s"chunk=$chunk")
      assert(chunked.exceptAll(fast).isEmpty && fast.exceptAll(chunked).isEmpty,
        s"chunk=$chunk must assign identically")
    }
  }

  test("duplicate-centroid ties resolve to the smallest cell id across chunks") {
    import spark.implicits._
    // two identical centroids land in DIFFERENT chunks (chunk=1): the
    // struct(score, id) combine must pick the smaller id, exactly as
    // the single-row argmin's strict < does
    val e = ops.Similarity.normalize(spark, Tables.embeddings(spark, sf))
      .select($"vec_id", $"ne")
    val base = e.filter($"vec_id" < 2)
      .select($"vec_id".as("cell"), $"ne".as("cv"))
    val dup = base.filter($"cell" === 0)
      .select(lit(7L).as("cell"), $"cv")
    val cents = base.unionByName(dup)
    val fast = ops.Similarity.assignCells(e, cents).select($"vec_id", $"cell")
    val chunked = ops.Similarity.assignCellsChunked(e, cents, 1)
      .select($"vec_id", $"cell")
    assert(chunked.exceptAll(fast).isEmpty && fast.exceptAll(chunked).isEmpty)
    // nothing may ever assign to the duplicate (larger) id
    assert(chunked.filter($"cell" === 7L).count() === 0)
  }
}
