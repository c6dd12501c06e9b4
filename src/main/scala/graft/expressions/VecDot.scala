package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
  * Null handling: standard binary-expression null-in → null-out. Arrays
  * of unequal length dot over the common prefix (the engine only feeds
  * it fixed-dimension embedding columns).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] is a
  // covariant subtype, so omitting the annotation satisfies the override.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
