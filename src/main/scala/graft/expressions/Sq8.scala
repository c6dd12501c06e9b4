package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Scalar (int8) quantization kernels for `ann_sq8` — the SQ8 storage
  * format every production vector store ships alongside PQ: each
  * dimension is linearly bucketed into one byte against per-dimension
  * corpus [min, max], an 8× compression that, unlike PQ, needs no
  * trained codebook (the "codebook" is 2·dim doubles of corpus stats).
  *
  * Codegen'd for the same reason as [[VecDot]]/[[PqArgmin]]: the
  * higher-order `transform(sequence(...))` formulation is
  * CodegenFallback, so both the corpus-wide encode pass and the
  * query×candidate ADC scan would pay an interpreted lambda per
  * element. These compile to tight primitive loops inside whole-stage
  * codegen.
  *
  * Determinism contract with the DuckDB oracle: every step is a pure
  * IEEE-754 double expression spelled identically on both sides —
  * `floor((x - min) / step)` for the code, `min + (code + 0.5) * step`
  * for the reconstruction, and the ADC dot is the same strict left
  * fold as [[VecDot]] — so codes and scores are bit-identical.
  */
object Sq8Ops {
  /** code_i = clamp_0_255(floor((x_i - min_i) / step_i)); a zero step
    * (constant dimension) encodes as 0. x ≥ min by construction, but
    * the low clamp guards reuse on out-of-corpus vectors. */
  def codes(v: ArrayData, mins: ArrayData, steps: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = steps.getDouble(i)
      val c = if (s == 0.0) 0
        else math.floor((v.getDouble(i) - mins.getDouble(i)) / s).toInt
      out(i) = java.lang.Integer.valueOf(if (c < 0) 0 else if (c > 255) 255 else c)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: exact query vs mid-rise reconstruction of the
    * candidate's codes, `acc += q_i * (min_i + (code_i + 0.5)*step_i)`
    * in index order. */
  def adc(q: ArrayData, codes: ArrayData, mins: ArrayData,
          steps: ArrayData): Double = {
    val n = q.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += q.getDouble(i) *
        (mins.getDouble(i) + (codes.getInt(i) + 0.5) * steps.getDouble(i))
      i += 1
    }
    acc
  }
}

/** `sq8_codes(v, mins, steps) -> array<int>`; NULL on any null input or
  * a dimension mismatch (a malformed stats row must surface). */
case class Sq8Codes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType),
    ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "sq8_codes"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val mins = b.asInstanceOf[ArrayData]
    val steps = c.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (mins.numElements() != n || steps.numElements() != n) null
    else Sq8Ops.codes(v, mins, steps)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n || $c.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.Sq8Ops.codes($a, $b, $c);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Sq8Codes =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `sq8_adc(q, codes, mins, steps) -> double` — fused
  * reconstruct-and-dot so the scan never materializes the dequantized
  * array; NULL on any null input or a dimension mismatch. */
case class Sq8Adc(first: Expression, second: Expression,
                  third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(IntegerType),
    ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "sq8_adc"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val mins = c.asInstanceOf[ArrayData]
    val steps = d.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (codes.numElements() != n || mins.numElements() != n ||
        steps.numElements() != n) null
    else Sq8Ops.adc(q, codes, mins, steps)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n || $c.numElements() != $n ||
         |    $d.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.Sq8Ops.adc($a, $b, $c, $d);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): Sq8Adc =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
