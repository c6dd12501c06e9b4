package graft

/** `table_timetravel`: the one-pass visible-version replay must agree
  * with an INDEPENDENT sequential re-application of the commits (base,
  * then batch 1, then batch 2, applied in order to a driver-side map),
  * the version-dependent action selector must actually produce the
  * delete-then-resurrect case, and snapshot 0 must be exactly the base
  * table.
  */
class TimetravelSpec extends SparkSpecBase {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private val DigestMod = 1000000000000L
  private val Offset = 2000000000L

  /** Sequential reference replay: base map, then each batch applied in
    * commit order — a DIFFERENT formulation than the engine's
    * single-pass latest-wins window. */
  private def refSnapshots(): Seq[Map[Long, (String, String)]] = {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    val snaps = scala.collection.mutable.ArrayBuffer(base)
    var cur = base
    for (v <- 1 to 2) {
      base.foreach { case (id, (text, src)) =>
        if (h60(s"tt$v:$id") % 10 == 0) {
          (id + v) % 3 match {
            case 0 => cur = cur - id
            case 1 => cur = cur + (id -> (s"$text [tt v$v]", src))
            case _ => cur = cur + ((id + v * Offset) -> (text, src))
          }
        }
      }
      snaps += cur
    }
    snaps.toSeq
  }

  test("op summary equals the sequential-replay reference per version") {
    val ref = refSnapshots()
    val got = SparkEntry.queries("table_timetravel")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === Set(0, 1, 2))
    for (v <- 0 to 2) {
      val m = ref(v)
      val nRows = m.size.toLong
      val nIns = m.keys.count(_ >= Offset).toLong
      val sum = m.map { case (id, (t, s)) => h60(s"$id|$t|$s") % DigestMod }.sum
      assert(got(v) === ((nRows, nIns, sum)), s"version $v")
    }
  }

  test("a v1-deleted key is resurrected by a v2 update (latest-wins)") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    val resurrected = base.filter { id =>
      h60(s"tt1:$id") % 10 == 0 && (id + 1) % 3 == 0 &&
        h60(s"tt2:$id") % 10 == 0 && (id + 2) % 3 == 1
    }
    assert(resurrected.nonEmpty,
      "fixture never exercises delete-then-update; selector is broken")
    val k = resurrected.min
    def snap(v: Int) = ops.Sources.ttSnapshot(spark, sf, v)
      .filter($"doc_id" === k).collect()
    assert(snap(0).length === 1)
    assert(snap(1).isEmpty, s"key $k should be deleted in v1")
    val s2 = snap(2)
    assert(s2.length === 1 && s2.head.getString(1).endsWith(" [tt v2]"))
  }

  test("change feed reconciles with snapshots version by version") {
    val ref = refSnapshots()
    val got = SparkEntry.queries("table_changes")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // v0 is the base commit: every row an insert, nothing else
    assert(got((0, "insert")) === ref(0).size.toLong)
    assert(!got.keySet.exists { case (v, t) => v == 0 && t != "insert" })
    // live-row deltas: rows(v) = rows(v-1) + inserts - deletes
    for (v <- 1 to 2) {
      val ins = got.getOrElse((v, "insert"), 0L)
      val del = got.getOrElse((v, "delete"), 0L)
      assert(ref(v).size.toLong === ref(v - 1).size + ins - del, s"v$v")
    }
    // the fixture never tombstones a dead key (deletes in v1/v2 are
    // disjoint key classes), so delete_noop must not appear
    assert(!got.keySet.exists(_._2 == "delete_noop"))
  }

  test("the v1-delete / v2-update resurrect key is a CDF insert at v2") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select($"doc_id")
      .collect().map(_.getLong(0))
    val k = base.filter { id =>
      h60(s"tt1:$id") % 10 == 0 && (id + 1) % 3 == 0 &&
        h60(s"tt2:$id") % 10 == 0 && (id + 2) % 3 == 1
    }.min
    val rows = ops.Sources.ttChangeRows(spark, sf)
      .filter($"doc_id" === k)
      .collect().map(r => r.getAs[Number]("version").intValue ->
        r.getAs[String]("change_type")).toMap
    assert(rows(0) === "insert")
    assert(rows(1) === "delete")
    assert(rows(2) === "insert", "resurrect must re-classify as insert")
  }

  test("vacuum: retained reads are byte-equal, scan cost strictly drops") {
    val rows = SparkEntry.queries("table_vacuum")(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet === Set(1, 2))
    rows.values.foreach { r =>
      assert(r.getAs[Boolean]("digest_match"),
        s"v${r.getInt(0)} vacuumed read diverged from full history")
      assert(r.getAs[Long]("rows_scanned_after") <
        r.getAs[Long]("rows_scanned_before"),
        s"v${r.getInt(0)} vacuum reclaimed nothing")
    }
    // the checkpoint at the cutoff is EXACTLY the live set: a v1 read
    // scans no dead rows at all
    assert(rows(1).getAs[Long]("rows_scanned_after") ===
      rows(1).getAs[Long]("n_rows"))
  }

  test("vacuumed store snapshots frame-equal the full-history store") {
    import spark.implicits._
    for (v <- 1 to 2) {
      val full = ops.Sources.ttSnapshot(spark, sf, v)
      val vac = ops.Sources.ttLiveAt(
        spark.read.parquet(s"${ops.Sources.ttVacStage(spark, sf)}/delta"), v)
      assert(vac.exceptAll(full).isEmpty && full.exceptAll(vac).isEmpty,
        s"version $v")
    }
  }

  test("snapshot 0 is exactly the base table") {
    import spark.implicits._
    val baseN = Tables.documents(spark, sf).count()
    val s0 = ops.Sources.ttSnapshot(spark, sf, 0)
    assert(s0.count() === baseN)
    // spot row equality via anti-join in both directions
    val base = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    assert(s0.exceptAll(base).isEmpty && base.exceptAll(s0).isEmpty)
  }
}
