package graft.expressions

import org.apache.spark.sql.SparkSession

/** Registers the engine's native Catalyst expressions as SQL functions
  * on a session, making them usable from `expr(...)` / `spark.sql`
  * exactly like built-ins (SURVEY §2.9 — preference order: built-in >
  * native `Expression` > UDF).
  *
  * Registration goes through the session's `FunctionRegistry`
  * (`createOrReplaceTempFunction` is idempotent, so every operator can
  * call [[ensure]] defensively regardless of which session the driver
  * hands it). The equivalent cluster-deploy path is
  * `SparkSessionExtensions.injectFunction` from a
  * `spark.sql.extensions` class — same builders, applied at session
  * construction; [[GraftExtensions]] provides it.
  */
object GraftFunctions {

  val builders: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "minhash_sig" -> (es => MinHashSig(es(0)))
  )

  def ensure(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}

/** `spark.sql.extensions`-loadable variant for cluster deployments:
  * `--conf spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[VecDot].getName, name),
        b))
    }
}
