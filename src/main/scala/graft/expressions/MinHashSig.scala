package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minhash parameters shared by the Spark expression and the DuckDB
  * oracle-SQL generator — both must build the SAME hash family.
  *
  * Design: one md5 per shingle instead of [[H]] of them (the md5 is
  * the expensive part; profiling showed the rest of the LSH pipeline's
  * cost lived in interpreted gram construction and the exact-Jaccard
  * verify join, both since replaced by codegen'd expressions — see
  * [[Grams]]). The shingle's 60-bit md5 prefix is reduced
  * mod the Mersenne prime [[P]] = 2^31-1 to a base value, and the H
  * family members are affine maps `(A(i)*base + B(i)) mod P` — the
  * classic universal-hash construction (Broder, "On the resemblance and
  * containment of documents", 1997). Products stay < 2^62, so the same
  * signed-64-bit arithmetic is exact in the JVM and in DuckDB, keeping
  * signatures bit-identical across engines. A/B are themselves
  * md5-derived (no RNG, no seed state), so any engine anywhere rebuilds
  * the identical family from these literals.
  */
object MinHash {
  /** 2^31 - 1, Mersenne prime: (P-1)·(P-1) + (P-1) < 2^62 — no overflow. */
  val P: Long = 2147483647L
  /** Hash family size (signature length). */
  val H: Int = 16

  /** 60-bit value of the first 15 hex digits of md5(s) — the same
    * construction as [[graft.functions.TextFns.hash60]]. */
  def hash60(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  /** Multipliers, nonzero mod P. */
  val A: Array[Long] = Array.tabulate(H)(i => hash60(s"mh-a:$i") % (P - 1) + 1)
  /** Offsets. */
  val B: Array[Long] = Array.tabulate(H)(i => hash60(s"mh-b:$i") % P)

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Full 60-bit md5-prefix hash over raw UTF-8 bytes — the fast-path
    * twin of [[graft.functions.TextFns.hash60]] (first 15 hex digits
    * of md5, built directly from the digest bytes). */
  def hash60(bytes: Array[Byte]): Long = {
    val digest = md5Local.get()
    digest.reset()
    val d = digest.digest(bytes)
    // first 15 hex digits = 7.5 bytes; build the 60-bit value directly
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** base(s) = (first 15 md5 hex digits as int) mod P, over raw UTF-8
    * bytes (Spark's `md5` and DuckDB's hash the same byte sequence). */
  def base(bytes: Array[Byte]): Long = hash60(bytes) % P

  /** One-pass signature: mins of the affine family over all shingles.
    * Called from both interpreted eval and generated code. */
  def sig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(H)(P) // P > any h in [0, P)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val b = base(s.getBytes)
        var i = 0
        while (i < H) {
          val h = (A(i) * b + B(i)) % P
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** DuckDB SQL for the base hash of shingle expression `e`. */
  def baseSql(e: String): String =
    s"(CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT) % $P)"

  /** DuckDB SQL for family member `i` over a pre-computed base column. */
  def memberSql(i: Int, baseCol: String): String =
    s"((${A(i)} * $baseCol + ${B(i)}) % $P)"
}

/** `minhash_sig(shingles: array<string>) -> array<bigint>` — the
  * 16-value minhash signature of a shingle set, one md5 + 16 affine
  * maps per element, in a single pass per row (no explode, no shuffle,
  * no per-element interpreted lambdas).
  *
  * Codegen emits a call to the static [[MinHash.sig]] loop — the
  * expression stays inside whole-stage codegen (no CodegenFallback row
  * boxing); the loop itself works directly on `ArrayData`/`UTF8String`
  * with a thread-local digest, which is what a Scala UDF can't do.
  *
  * Empty input array → signature of all-[[MinHash.P]] sentinels;
  * callers filter empty shingle sets upstream.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHash.sig($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
