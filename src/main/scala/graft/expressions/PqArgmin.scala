package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `pq_argmin(sv, flat, cvvs, ids) -> BIGINT` — the cell id of the
  * codebook centroid minimizing `cvvs[j] - 2·(sv · flat[j·d .. j·d+d])`
  * (the min-squared-L2 assignment with the row-constant `sv·sv` term
  * dropped), evaluated row-locally over a packed codebook.
  *
  * This exists because the relational formulation of PQ assignment —
  * explode sub-rows × K broadcast centroids, then argmin per (vec,
  * subspace) — materializes N×K scored rows, and the argmin itself
  * cannot run as a Tungsten hash aggregate (the carried payload makes
  * it a sort-based ObjectHashAggregate). One codegen'd loop over the
  * packed codebook turns the whole assignment into a map stage: no row
  * explosion, no aggregate, no sort (~6 s → ~1 s for `ann_pq`'s three
  * assignment passes at sf0.1).
  *
  * Contract (mirrors the DuckDB oracle's
  * `ROW_NUMBER() OVER (... ORDER BY cvv - 2*dot ASC, cell ASC) = 1`):
  *  - `flat` is the K centroid vectors concatenated in ascending-cell
  *    order, `cvvs[j]` their precomputed self-dots, `ids[j]` their cell
  *    ids (ascending). The caller packs via array_sort, so a strict
  *    `<` comparison returns the smallest cell on score ties.
  *  - the dot is the same strict left fold as [[VecDot]], and the
  *    score the same `cvv - 2*dot` expression tree both engines use —
  *    bit-identical doubles, identical argmin.
  *  - null inputs, an empty codebook, or a `flat` length that is not
  *    K·dim(sv) yield NULL (a malformed codebook must surface, not
  *    silently assign cell 0).
  *  - a degenerate all-NaN score vector returns `ids[0]` — the
  *    smallest cell id — so the result is always a valid cell.
  */
case class PqArgmin(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType),
    ArrayType(DoubleType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_argmin"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val flat = b.asInstanceOf[ArrayData]
    val cvvs = c.asInstanceOf[ArrayData]
    val ids = d.asInstanceOf[ArrayData]
    val dim = sv.numElements()
    val k = cvvs.numElements()
    if (k == 0 || ids.numElements() != k || flat.numElements() != k * dim)
      return null
    // Init to the first (smallest) cell id so a degenerate all-NaN score
    // vector still yields a VALID cell, not the sentinel 0L (which need
    // not be a cell id at all).
    var best = ids.getLong(0)
    var bestScore = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) { dot += sv.getDouble(i) * flat.getDouble(off + i); i += 1 }
      val score = cvvs.getDouble(j) - 2 * dot
      if (score < bestScore) { bestScore = score; best = ids.getLong(j) }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, flat, cvvs, ids) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |int $dim = $sv.numElements();
         |int $k = $cvvs.numElements();
         |if ($k == 0 || $ids.numElements() != $k || $flat.numElements() != $k * $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = $ids.getLong(0);
         |  double $bestScore = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    int $off = $j * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $sv.getDouble($i) * $flat.getDouble($off + $i);
         |    }
         |    double $score = $cvvs.getDouble($j) - 2 * $dot;
         |    if ($score < $bestScore) { $bestScore = $score; $best = $ids.getLong($j); }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PqArgmin =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
