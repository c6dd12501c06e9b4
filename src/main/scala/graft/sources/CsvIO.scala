package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink with the reference's robustness semantics —
  * SURVEY §2.1 (S1, S5).
  *
  * Read (S1, reference `pipeline.py:43-77`): header, `"` quote and
  * escape, permissive mode, every column `StringType` (schema-on-read;
  * typing happens later with try_cast so malformed values become NULL
  * instead of failing the load). An optional overflow column captures
  * rows with extra delimiters — the reference's quarantine mechanism
  * (`null_padding` + `column12`).
  *
  * Write (S5, reference `pipeline.py:497-522`): header, force-quoted
  * fields, NULL as empty string. At scale the writer keeps one file per
  * partition; `singleFile=true` coalesces to 1 for small-export parity
  * with the reference's `COPY TO`.
  */
object CsvIO {

  /** All-string schema of `names` plus `overflow` trailing columns. */
  def allVarcharSchema(names: Seq[String], overflow: Int = 1): StructType =
    StructType(
      names.map(StructField(_, StringType, nullable = true)) ++
        (0 until overflow).map(i => StructField(s"_overflow$i", StringType, nullable = true)))

  /** Permissive all-varchar CSV scan (S1). */
  def readRobust(spark: SparkSession, path: String, columnNames: Seq[String],
                 overflowColumns: Int = 1): DataFrame =
    spark.read
      .schema(allVarcharSchema(columnNames, overflowColumns))
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("nullValue", "")
      .csv(path)

  /** Quoted CSV export (S5). */
  def writeQuoted(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
  }

  /** Split a permissively-read frame into (good, quarantined) on the
    * overflow column — the reference's quarantine policy
    * (`pipeline.py:86-113`): a non-blank overflow value means the row
    * had extra delimiters and cannot be repaired safely. */
  def quarantine(raw: DataFrame, overflowCol: String = "_overflow0")
      : (DataFrame, DataFrame) = {
    val bad = raw.col(overflowCol).isNotNull &&
      trim(raw.col(overflowCol)) =!= ""
    (raw.filter(!bad).drop(overflowCol), raw.filter(bad))
  }
}
