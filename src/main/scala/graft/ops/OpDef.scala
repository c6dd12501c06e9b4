package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator demonstration: a named DataFrame query over the
  * testdata tables plus (where expressible) the equivalent DuckDB SQL
  * the driver uses as a correctness oracle.
  *
  * Conventions every def follows (SURVEY §7.4):
  *   - deterministic total ordering (`orderBy` over a unique key set);
  *   - computed columns aliased identically in Spark and oracle SQL;
  *   - no order-dependent float aggregation ([[graft.functions.Exact]]);
  *   - no array/map/struct-typed OUTPUT columns: the driver's pandas
  *     canonicalizer cannot sort nested cells (it crashed on
  *     `fn_array`'s `array<string>` column in round 9). Render nested
  *     values as strings (`array_join`/`to_json`) in BOTH engines.
  */
final case class OpDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpDef {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
            oracle: String): OpDef = OpDef(name, fn, Some(oracle))
}
