package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `pq_min_score(sv, flat, cvvs) -> DOUBLE` — the winning SCORE of the
  * [[PqArgmin]] assignment (`min_j cvvs[j] − 2·(sv · flat[j·d ..])`),
  * over the same packed-codebook layout.
  *
  * Exists for the CHUNKED assignment path ([[graft.ops.Similarity]]'s
  * `assignCellsChunked`): when a codebook outgrows what one packed
  * broadcast row should carry (~2 MB — the √N nlist policy reaches
  * that around N ≈ 10⁸ vectors at dim 64), it is split into multiple
  * packed rows and each chunk reports its local (score, id); the
  * global winner is then `min(struct(score, id))` — which needs the
  * score [[PqArgmin]] deliberately drops. Same strict-left-fold dot
  * and score expression tree, so the double is bit-identical to the
  * score the unchunked argmin ranked on; an empty/malformed chunk
  * yields NULL (dropped by the combine, never scored as 0). */
case class PqMinScore(first: Expression, second: Expression,
                      third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType),
    ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_min_score"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val flat = b.asInstanceOf[ArrayData]
    val cvvs = c.asInstanceOf[ArrayData]
    val dim = sv.numElements()
    val k = cvvs.numElements()
    if (k == 0 || flat.numElements() != k * dim) return null
    var best = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) { dot += sv.getDouble(i) * flat.getDouble(off + i); i += 1 }
      val score = cvvs.getDouble(j) - 2 * dot
      if (score < best) best = score
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, flat, cvvs) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      s"""
         |int $dim = $sv.numElements();
         |int $k = $cvvs.numElements();
         |if ($k == 0 || $flat.numElements() != $k * $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    int $off = $j * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $sv.getDouble($i) * $flat.getDouble($off + $i);
         |    }
         |    double $score = $cvvs.getDouble($j) - 2 * $dot;
         |    if ($score < $best) { $best = $score; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqMinScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}
