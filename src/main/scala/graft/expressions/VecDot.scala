package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * The round-1 engine computed cosine with `aggregate(zip_with(...))`
  * higher-order functions; those are CodegenFallback expressions, so a
  * pairwise similarity scan (|pairs| × dim lambda invocations, each an
  * interpreted closure over boxed rows) dominated the bench:
  * `dedup_embedding` alone cost 45 s at sf0.1 (2k vectors → 2M pairs).
  * This expression compiles to a tight primitive `double` loop inside
  * whole-stage codegen — same IEEE add/multiply sequence (strict left
  * fold, `acc += x(i)*y(i)` in index order), so results stay
  * bit-identical to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(list_zip(a, b), ...)))`
  * formulation, while the scan runs at memory bandwidth.
  *
  * Null handling: standard binary-expression null-in → null-out, and
  * unequal-length arrays are NULL too — the DuckDB oracle's `list_zip`
  * NULL-pads the short side, which poisons its fold to NULL, so a
  * dimension mismatch must surface identically in both engines rather
  * than being silently masked as a prefix dot.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] is a
  // covariant subtype, so omitting the annotation satisfies the override.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  /** Unit-normalize: each element divided by the L2 norm, norm built by
    * the same strict left fold as [[VecDot]] (`acc += x*x` in index
    * order) so results stay bit-identical to the DuckDB oracle's
    * `list_transform(ed, x -> x / sqrt(<dot>(ed, ed)))`. */
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    val nrm = math.sqrt(acc)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}

/** `vec_normalize(array<double>) -> array<double>` — codegen'd unit
  * normalization; the higher-order `transform` formulation it replaces
  * was CodegenFallback (interpreted per element). */
case class VecNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "vec_normalize"

  override protected def nullSafeEval(input: Any): Any =
    VecOps.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VecOps.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
}
