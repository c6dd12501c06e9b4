package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns.hash60

/** Pins `merge_into`'s three-way action semantics against an
  * independent re-derivation of the batch from the same documents
  * table: action counts, key spaces, and per-action content digests
  * (updates must hold the recrawled text, deletes the old text,
  * inserts the original text under the offset key).
  */
class MergeIntoSpec extends SparkSpecBase {

  private val Off = 1000000000L

  test("merge_into: actions, key spaces, and digests reconcile") {
    val out = SparkEntry.queries("merge_into")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
        (hash60(concat(lit("inc:"), col("doc_id"))) % 10 === 0).as("inc"))
      .cache()
    val n = docs.count()
    val byAction = out.groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDel = docs.filter(col("inc") && col("doc_id") % 3 === 0).count()
    val nUpd = docs.filter(col("inc") && col("doc_id") % 3 === 1).count()
    val nIns = docs.filter(col("inc") && col("doc_id") % 3 === 2).count()
    // an insert lands in fresh key space — its template doc stays kept
    assert(byAction.getOrElse("kept", 0L) === n - nDel - nUpd)
    assert(byAction.getOrElse("deleted", 0L) === nDel)
    assert(byAction.getOrElse("updated", 0L) === nUpd)
    assert(byAction.getOrElse("inserted", 0L) === nIns)
    // inserted rows live in the offset key space with the ORIGINAL
    // text; updated rows hold the recrawl marker; deleted/kept the old
    val expected = docs.select(col("doc_id"), md5(col("text")).as("m"),
      md5(concat(col("text"), lit(" [recrawl]"))).as("mr"))
    val ins = out.filter(col("action") === "inserted")
      .join(expected.withColumn("doc_id", col("doc_id") + Off), "doc_id")
    assert(ins.filter(col("content_md5") =!= col("m")).count() === 0)
    assert(out.filter(col("action") === "inserted" && col("doc_id") < Off)
      .count() === 0)
    val upd = out.filter(col("action") === "updated").join(expected, "doc_id")
    assert(upd.filter(col("content_md5") =!= col("mr")).count() === 0)
    val old = out.filter(col("action").isin("kept", "deleted"))
      .join(expected, "doc_id")
    assert(old.filter(col("content_md5") =!= col("m")).count() === 0)
    out.unpersist(); docs.unpersist()
  }

  test("merge_into_evolve: NULL backfill, old files untouched, actions hold") {
    val path = ops.Sources.mergeEvolveStage(spark, sf)
    // the evolution's core claim: gen-1 files keep the OLD physical
    // schema (no rewrite when the column landed) ...
    val gen1 = spark.read.parquet(s"$path/gen=1")
    assert(!gen1.columns.contains("lang"),
      "gen-1 files must stay at the pre-evolution physical schema")
    // ... while the merged read surfaces the widened schema with NULL
    // backfill exactly on the old generation
    val out = SparkEntry.queries("merge_into_evolve")(spark, sf).cache()
    assert(out.columns.contains("lang"))
    assert(out.filter(col("gen") === 1 && col("lang").isNotNull)
      .count() === 0, "old-generation rows must backfill lang as NULL")
    assert(out.filter(col("gen") === 2 && col("lang").isNull)
      .count() === 0, "every upserted row carries its batch lang")
    // action reconciliation against merge_into: deleted keys vanish,
    // updated/inserted keys sit in gen-2, kept keys in gen-1
    val audit = SparkEntry.queries("merge_into")(spark, sf).cache()
    def keys(a: String) =
      audit.filter(col("action") === a).select(col("doc_id"))
    assert(out.join(keys("deleted"), Seq("doc_id"), "left_semi")
      .count() === 0, "deleted keys must not survive the merge")
    assert(out.filter(col("gen") === 2)
      .join(keys("updated").union(keys("inserted")), Seq("doc_id"),
        "left_anti").count() === 0)
    assert(out.filter(col("gen") === 1)
      .join(keys("kept"), Seq("doc_id"), "left_anti").count() === 0)
    assert(out.count() === audit.filter(col("action") =!= "deleted").count())
    out.unpersist(); audit.unpersist()
  }

  test("merge_into_delete: action histogram reconciles with the row-level merge") {
    import spark.implicits._
    val hist = SparkEntry.queries("merge_into_delete")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent expectation from the row-level merge op: the guarded
    // delete splits that op's 'deleted' class by the retention
    // predicate (even normalized length); every other class carries
    // over unchanged
    val rows = SparkEntry.queries("merge_into")(spark, sf).cache()
    val byAction = rows.groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist.getOrElse("kept", 0L) === byAction.getOrElse("kept", 0L))
    assert(hist.getOrElse("updated", 0L) === byAction.getOrElse("updated", 0L))
    assert(hist.getOrElse("inserted", 0L) === byAction.getOrElse("inserted", 0L))
    assert(hist.getOrElse("deleted", 0L) + hist.getOrElse("delete_skipped", 0L)
      === byAction.getOrElse("deleted", 0L),
      "the guard only splits the unguarded op's delete class")
    assert(hist.values.sum === rows.count(),
      "histogram covers every merged row exactly once")
    assert(hist.getOrElse("deleted", 0L) > 0 &&
      hist.getOrElse("delete_skipped", 0L) > 0,
      "both guard branches must be exercised by the fixture")
    rows.unpersist()
  }
}
