package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Row-local 32-bit simhash over a token array — the whole signature in
  * ONE pass per row, called from interpreted eval and generated code
  * alike (the [[MinHashSig]] pattern).
  *
  * This replaces the explode → 32×`sum(when(...))` aggregate
  * formulation, which was correct but paid twice at scale: the explode
  * shuffled every token occurrence into a doc-keyed hash aggregate
  * (32 longs of state per doc), and the 32-column conditional aggregate
  * was the single largest codegen unit in the engine — profiled at ~8 s
  * of compile/JIT on first use, billed to whichever dedup query ran
  * first. Row-local evaluation needs no shuffle, no aggregation state,
  * and a compiled footprint of one static call.
  *
  * Semantics are bit-identical to the aggregate version and to the
  * DuckDB oracle (which keeps the unnest+SUM formulation): per token
  * OCCURRENCE (duplicates count), bit j of [[MinHash.hash60]] votes
  * +1/-1 into 32 counters; bit j of the result is set iff its counter
  * is strictly positive. A null token votes -1 on every bit, exactly
  * like `WHEN ((NULL >> j) & 1) = 1 THEN 1 ELSE -1`.
  */
object SimHash {
  val Bits = 32

  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](Bits)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s == null) {
        var b = 0
        while (b < Bits) { sums(b) -= 1; b += 1 }
      } else {
        val h = MinHash.hash60(s.getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var v = 0L
    var b = 0
    while (b < Bits) { if (sums(b) > 0) v |= (1L << b); b += 1 }
    v
  }
}

/** `simhash32(tokens: array<string>) -> bigint` — one codegen'd pass
  * per row; callers filter empty token arrays upstream (an empty array
  * yields 0, whereas the aggregate/oracle formulation drops the row). */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}
