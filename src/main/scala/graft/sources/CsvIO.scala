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

  /** Quoted CSV export (S5). Escape is `"` (doubled quotes), the
    * reference's `ESCAPE '"'` convention, not Spark's default `\`. */
  def writeQuoted(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
  }

  /** Byte-exact twin of the reference's
    * `COPY ... (HEADER, FORCE_QUOTE *, NULL '')` (`pipeline.py:497-522`):
    * every non-null field quoted with internal quotes doubled, NULL as
    * a BARE empty field — the one rendering Spark's CSV writer cannot
    * produce (it quotes the null's empty string too). Each line is
    * assembled by plain codegen'd string expressions, so rendering
    * distributes; the single header-topped output file is the
    * small-export parity contract (at scale, keep one headerless part
    * per partition and skip the final assembly). Writes ONE file at
    * `path`. */
  def writeQuotedCopy(df: DataFrame, path: String): Unit = {
    val line = concat_ws(",", df.columns.map { c =>
      val v = df.col(c).cast(StringType)
      when(v.isNull, lit(""))
        .otherwise(concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\"")))
    }.toIndexedSeq: _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_csvcopy_")
    df.select(line.as("value")).coalesce(1)
      .write.mode(SaveMode.Overwrite).text(dir.toString)
    val part = dir.toFile.listFiles().filter(_.getName.startsWith("part-")).head
    val header = df.columns
      .map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(",") + "\n"
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(target,
      header.getBytes("UTF-8") ++ java.nio.file.Files.readAllBytes(part.toPath))
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
