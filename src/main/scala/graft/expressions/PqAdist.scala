package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `pq_adist(q, slots, flat, cvvs) -> DOUBLE` — the asymmetric (ADC)
  * PQ distance between a full query vector `q` and one candidate's
  * per-subspace codes, evaluated row-locally against a packed global
  * codebook: with M = |slots| and d = |q| / M,
  *
  *   adist = Σ_m  (q_m·q_m − 2·(q_m · flat[slots[m]·d ..]) + cvvs[slots[m]])
  *
  * where q_m is the m-th d-wide slice of `q` and `slots[m]` indexes the
  * GLOBAL packed codebook (all subspaces' surviving centroids
  * concatenated in (m asc, cell asc) order — global slots, not per-m
  * cell ids, because Lloyd rounds can leave different surviving cell
  * sets per subspace and a fixed m·K stride would mis-index them).
  *
  * This exists because the relational ADC formulation — a per-query
  * distance TABLE joined to code rows — materializes |queries|·M·K
  * table rows. For the fixed Q=20 search demos that table is tiny and
  * broadcastable, but an ingest-sized query batch (|inc| ≈ N/10) makes
  * it the biggest frame in the plan (≈2×10¹¹ rows at N=10⁹). One
  * codegen'd loop turns the whole ADC scan into a map stage over the
  * routed-cell join: per candidate row it reads 8 B of codes plus the
  * one broadcast codebook, and nothing per (query, code) pair is ever
  * materialized or shuffled.
  *
  * Parity contract (mirrors the DuckDB oracle exactly):
  *  - each subspace term is the same expression tree both engines use:
  *    `(dot(sv,sv) − 2·dot(sv,cv)) + cvv`, with both dots the strict
  *    ascending left fold of [[VecDot]];
  *  - terms accumulate in ascending-m order from 0.0 — the oracle's
  *    `list_reduce(list_prepend(0.0, list(pd ORDER BY m)), +)` — so
  *    the float sum is bit-identical, not merely close;
  *  - null inputs, |q| not divisible by |slots|, mismatched flat/cvvs
  *    shapes, or an out-of-range slot yield NULL (a malformed store
  *    must surface, not score as garbage).
  */
case class PqAdist(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(LongType),
    ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_adist"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val slots = b.asInstanceOf[ArrayData]
    val flat = c.asInstanceOf[ArrayData]
    val cvvs = d.asInstanceOf[ArrayData]
    val m = slots.numElements()
    val nSlots = cvvs.numElements()
    if (m == 0 || q.numElements() % m != 0 ||
        flat.numElements() != nSlots * (q.numElements() / m))
      return null
    val dim = q.numElements() / m
    var adist = 0.0
    var j = 0
    while (j < m) {
      val slot = slots.getLong(j)
      if (slot < 0 || slot >= nSlots) return null
      val qOff = j * dim
      val cOff = slot.toInt * dim
      var dsv = 0.0
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val qv = q.getDouble(qOff + i)
        dsv += qv * qv
        dot += qv * flat.getDouble(cOff + i)
        i += 1
      }
      adist += dsv - 2 * dot + cvvs.getDouble(slot.toInt)
      j += 1
    }
    adist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, slots, flat, cvvs) => {
      val m = ctx.freshName("m")
      val nSlots = ctx.freshName("nSlots")
      val dim = ctx.freshName("dim")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val slot = ctx.freshName("slot")
      val qOff = ctx.freshName("qOff")
      val cOff = ctx.freshName("cOff")
      val dsv = ctx.freshName("dsv")
      val dot = ctx.freshName("dot")
      val qv = ctx.freshName("qv")
      val adist = ctx.freshName("adist")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $slots.numElements();
         |int $nSlots = $cvvs.numElements();
         |if ($m == 0 || $q.numElements() % $m != 0 ||
         |    $flat.numElements() != $nSlots * ($q.numElements() / $m)) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $dim = $q.numElements() / $m;
         |  double $adist = 0.0;
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $m && !$bad; $j++) {
         |    long $slot = $slots.getLong($j);
         |    if ($slot < 0 || $slot >= $nSlots) { $bad = true; break; }
         |    int $qOff = $j * $dim;
         |    int $cOff = (int) $slot * $dim;
         |    double $dsv = 0.0;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $qv = $q.getDouble($qOff + $i);
         |      $dsv += $qv * $qv;
         |      $dot += $qv * $flat.getDouble($cOff + $i);
         |    }
         |    $adist += $dsv - 2 * $dot + $cvvs.getDouble((int) $slot);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $adist; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PqAdist =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
