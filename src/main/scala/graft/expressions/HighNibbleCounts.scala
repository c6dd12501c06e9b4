package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local positional profile of a hex string in ONE pass: the count
  * of high-nibble chars (`8-9`, `A-F`) in each of `nSegs` equal
  * segments, plus the whole-string count as the last element — the
  * input `mm_phash`'s average-hash signature folds into bits.
  *
  * This replaces the `nSegs + 1` separate `substring` + `regexp_replace`
  * column scans the signature originally paid (each one re-walking the
  * payload hex): one static call walks the bytes once, no regex
  * machinery, and widening the signature (more segments = a
  * later-saturating hash) no longer multiplies scan cost. Segment
  * length is `len / nSegs` (integer division); the remainder tail
  * belongs to no segment but DOES count toward the total — exactly the
  * `substring(hexp, j*seg+1, seg)` / whole-string `regexp_replace`
  * split the DuckDB oracle keeps.
  */
object HighNibble {

  /** counts per segment ++ total, as an int array of nSegs + 1. */
  def profile(s: UTF8String, nSegs: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val segLen = len / nSegs
    val out = new Array[Int](nSegs + 1)
    var i = 0
    while (i < len) {
      val b = bytes(i)
      // Both hex cases: call sites feed Spark hex() (uppercase), but the
      // function is registered globally and md5()-style lowercase hex
      // must count a-f as high too (mirrors the oracle's [0-7]-complement
      // regex, which is case-blind on the high nibbles).
      if ((b >= '8' && b <= '9') || (b >= 'A' && b <= 'F') ||
          (b >= 'a' && b <= 'f')) {
        out(nSegs) += 1
        if (segLen > 0) {
          val seg = i / segLen
          if (seg < nSegs) out(seg) += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(Int.box))
  }
}

/** `high_nibble_counts(hexstr) -> array<int>` of NSegs + 1 (per-segment
  * high-nibble counts, whole-string total last). Segment count is fixed
  * at [[HighNibbleCounts.NSegs]] — the phash geometry constant — so the
  * codegen call compiles to one static invoke with no per-row args. */
case class HighNibbleCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "high_nibble_counts"

  override protected def nullSafeEval(input: Any): Any =
    HighNibble.profile(input.asInstanceOf[UTF8String], HighNibbleCounts.NSegs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HighNibble.profile($c, " +
        s"${HighNibbleCounts.NSegs});")

  override protected def withNewChildInternal(newChild: Expression): HighNibbleCounts =
    copy(child = newChild)
}

object HighNibbleCounts {
  /** Segments in the phash signature — 32 bits; 4 bands × 8 bits keeps
    * Hamming radius 3 LSH-exact (pigeonhole over 4 bands) while 8-bit
    * band values spread buckets 16× wider than the original 4-bit demo
    * geometry. */
  val NSegs = 32
}
