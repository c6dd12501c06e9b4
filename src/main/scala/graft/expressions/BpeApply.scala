package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local BPE merge application for `bpe_train_merges`/`bpe_encode`.
  *
  * Each merge `"a b"` is applied to the token array with the standard
  * greedy LEFT-TO-RIGHT NON-OVERLAPPING scan (a run `a a a` merges
  * once, leaving `[a a, a]`), merges in rank order — exactly the
  * semantics the gaps-and-islands window rewrite (and the DuckDB
  * oracle's CTE chain) implements, but in one tight loop per row
  * inside whole-stage codegen. This removes the per-round doc-keyed
  * window passes (crossJoin + lead/lag/row_number/min-over — four
  * window functions over every (doc, pos) token row) that made corpus
  * rewriting the dominant cost of the BPE family: the rewrite becomes
  * a map stage, and the only shuffles left in training are the
  * pair-count aggregates. `LmCurationSpec` pins expression ≡ window
  * rewrite on the greedy-overlap hand case AND on real testdata.
  */
object BpeOps {

  /** Apply `merges` (each a `"a b"` pair, rank order) to `toks`. */
  def apply(toks: ArrayData, merges: ArrayData): ArrayData = {
    var cur = new Array[UTF8String](toks.numElements())
    var n = cur.length
    var i = 0
    while (i < n) { cur(i) = toks.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    var m = 0
    while (m < merges.numElements()) {
      val pair = merges.getUTF8String(m)
      if (pair != null) {
        // the merge arrives as a || CHR(1) || b: a may itself contain
        // spaces (it is a prior merged symbol), so a space could not
        // delimit the pair unambiguously
        val sep = pair.indexOf(UTF8String.fromString(""), 0)
        if (sep >= 0) {
          val a = pair.substring(0, sep)
          val b = pair.substring(sep + 1, pair.numChars())
          val out = new Array[UTF8String](n)
          var w = 0
          var r = 0
          while (r < n) {
            if (r + 1 < n && cur(r) != null && cur(r + 1) != null &&
                cur(r).equals(a) && cur(r + 1).equals(b)) {
              out(w) = UTF8String.concatWs(space, a, b)
              r += 2
            } else {
              out(w) = cur(r)
              r += 1
            }
            w += 1
          }
          cur = out
          n = w
        }
      }
      m += 1
    }
    val res = new Array[Any](n)
    i = 0
    while (i < n) { res(i) = cur(i); i += 1 }
    new GenericArrayData(res)
  }
}

/** `bpe_apply(tokens ARRAY<STRING>, merges ARRAY<STRING>) ->
  * ARRAY<STRING>` — merges encoded as `a || CHR(1) || b` so the pair
  * boundary survives symbols that already contain spaces. */
case class BpeApply(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_apply"

  override protected def nullSafeEval(toks: Any, merges: Any): Any =
    BpeOps.apply(toks.asInstanceOf[ArrayData], merges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.BpeOps.apply($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApply =
    copy(left = newLeft, right = newRight)
}
