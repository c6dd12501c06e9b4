package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Exact connected components of ONE community's intra-edge list —
  * the row-local core of the Leiden refinement phase (Traag, Waltman
  * & van Eck 2019, arXiv:1810.08473 §A).
  *
  * The Leiden ops' move rounds are capacity-1 (each community accepts
  * at most one mover per round — see `louvainMoveBest`), so a level-l
  * community holds at most `1 + l·R` nodes for R move rounds per
  * level: level 1 grows a singleton by ≤R members, and each later
  * level's base community regroups the previous level's ≤(1+(l−1)·R)
  * fragments and again gains ≤R. Groups are therefore CONSTANT-sized
  * (≤7 nodes at R=2, L=3) at ANY corpus scale, which is what makes
  * "collect the community's edges into one row and solve exactly"
  * the right distributed shape: one keyed shuffle of the intra edge
  * list replaces `O(diameter)` iterative join+aggregate rounds, and
  * the resulting fragment labels are EXACT — every emitted fragment
  * is a connected component, unconditionally, where bounded min-label
  * propagation was only exact up to its round budget.
  *
  * Semantics: edges are treated as undirected; every member must
  * appear (callers union a self-edge per member, which is also how
  * isolated members survive). Output is one `(node, flabel)` struct
  * per distinct node, `flabel` = the minimum node id reachable from
  * it — identical to min-label propagation run to convergence, which
  * is what the DuckDB oracle renders (with a provably-sufficient
  * round count from the same size bound). Nodes are emitted in
  * ascending id order (deterministic row-local output). */
object CcFrag {
  def fragments(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // distinct sorted node ids (groups are tiny — see size bound)
    val ids = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      ids.add(e.getLong(0)); ids.add(e.getLong(1))
      i += 1
    }
    val nodes = new Array[Long](ids.size())
    val it = ids.iterator()
    var j = 0
    while (it.hasNext) { nodes(j) = it.next(); j += 1 }
    // union-find over node indices, min-index (= min-id) roots
    val parent = Array.tabulate(nodes.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      val a = find(java.util.Arrays.binarySearch(nodes, e.getLong(0)))
      val b = find(java.util.Arrays.binarySearch(nodes, e.getLong(1)))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      i += 1
    }
    val out = new Array[Any](nodes.length)
    j = 0
    while (j < nodes.length) {
      out(j) = InternalRow(nodes(j), nodes(find(j)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `cc_fragments(edges: array<struct<src,dst>>) ->
  * array<struct<node:bigint, flabel:bigint>>` — exact per-group
  * connected components with min-id labels (the [[SimHash32]]
  * delegate-to-static codegen pattern). */
case class CcFragments(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fs), _)
          if fs.length == 2 && fs.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cc_fragments expects array<struct<bigint,bigint>>, got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("flabel", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "cc_fragments"

  override protected def nullSafeEval(input: Any): Any =
    CcFrag.fragments(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CcFrag.fragments($c);")

  override protected def withNewChildInternal(newChild: Expression): CcFragments =
    copy(child = newChild)
}
