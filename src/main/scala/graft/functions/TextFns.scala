package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/hash column builders shared by the dedup, similarity and text
  * analysis operators.
  *
  * Cross-engine determinism: every hash is derived from `md5` (identical
  * in Spark and DuckDB) truncated to 15 hex digits = 60 bits, parsed as
  * a non-negative BIGINT. Spark's `xxhash64`/`hash` would be faster but
  * have no DuckDB twin, which would make the oracle unverifiable; md5
  * keeps every signature bit-identical across engines AND across
  * cluster re-runs (no seed, no partition dependence).
  *
  * Everything here is built from codegen'd built-ins / higher-order
  * functions — no Scala UDFs, so whole-stage codegen and column pruning
  * survive, and the expressions ship to any cluster without closures.
  */
object TextFns {

  /** 60-bit non-negative hash of a string, identical in DuckDB as
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** SQL twin of [[hash60]] for oracle generation. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
  def hash60Sql(seed: Int, expr: String): String =
    hash60Sql(s"'$seed:' || $expr")

  /** Lowercase, collapse runs of whitespace to single spaces, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  val normalizeTextSql: String => String =
    e => s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(normalizeText(c), " ")

  def tokensSql(e: String): String =
    s"string_split(${normalizeTextSql(e)}, ' ')"

  /** `k`-word shingles (space-joined) over a token array column, via
    * the codegen'd [[graft.expressions.WordShingles]] (the equivalent
    * `transform(sequence(...))` formulation is CodegenFallback — every
    * shingle paid an interpreted-lambda round-trip, which dominated the
    * LSH pipelines). Callers must have run `GraftFunctions.ensure` on
    * the session. Short inputs yield an empty (non-null) array. */
  def wordShingles(tokensColName: String, k: Int): Column =
    expr(s"word_shingles($tokensColName, $k)")

  /** Character `n`-grams of a (pre-normalized) string column by name —
    * codegen'd [[graft.expressions.CharNgrams]]; same notes as
    * [[wordShingles]]. */
  def charNgrams(colName: String, n: Int): Column =
    expr(s"char_ngrams($colName, $n)")
}
