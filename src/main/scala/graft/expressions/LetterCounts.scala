package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local letter histogram in ONE pass: counts of `a`–`z` (byte
  * scan — ASCII letters are single UTF-8 bytes and continuation bytes
  * are ≥ 0x80, so multi-byte code points can never alias a letter)
  * plus the total letter count as element 26. Replaces `text_entropy`'s
  * 26 separate `regexp_replace` length scans, each of which re-walked
  * the normalized text and compiled its own regex.
  */
object LetterHist {

  /** 26 per-letter counts ++ total, as a long array of 27. */
  def counts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Long](27)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        out(b - 'a') += 1
        out(26) += 1
      }
      i += 1
    }
    new GenericArrayData(out.map(Long.box))
  }
}

/** `letter_counts(str) -> array<bigint>` of 27 (a–z counts, total last). */
case class LetterCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "letter_counts"

  override protected def nullSafeEval(input: Any): Any =
    LetterHist.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.LetterHist.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): LetterCounts =
    copy(child = newChild)
}
