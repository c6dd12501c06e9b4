package graft

import org.apache.spark.sql.SparkSession

/** The cluster-deploy registration path must actually work: a session
  * constructed with [[graft.expressions.GraftExtensions]] applied gets
  * every engine function WITHOUT any `GraftFunctions.ensure` call —
  * the way a real cluster ships them. (`--conf spark.sql.extensions=…`
  * is the submit-time spelling; it is a STATIC conf read from the
  * shared SparkContext, so an in-JVM second session must apply the
  * same class via `builder.withExtensions` — identical injection
  * path, same `GraftExtensions` instance under test.)
  */
class ExtensionsDeploySpec extends SparkSpecBase {

  test("GraftExtensions registers engine functions at session construction") {
    val shared = spark // materialize the suite session before detouring
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-deploy")
        .withExtensions(new graft.expressions.GraftExtensions)
        .config("spark.ui.enabled", "false")
        // keep the new session's (unused) warehouse out of the repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/graft_ext_warehouse")
        .getOrCreate()
      assert(s2 ne shared) // a NEW session, or extensions never applied
      val v = s2.sql(
        "SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS v")
        .first().getDouble(0)
      assert(v === 11.0)
      val c = s2.sql(
        "SELECT pq_argmin(array(1.0D,0.0D), array(1.0D,0.0D,0.0D,1.0D), " +
          "array(1.0D,1.0D), array(3L,7L)) AS c")
        .first().getLong(0)
      assert(c === 3L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
