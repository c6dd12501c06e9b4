package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static gram builders called from both interpreted eval and generated
  * code (the [[MinHashSig]] pattern).
  *
  * These exist because Spark's `transform(sequence(...), i -> ...)`
  * higher-order formulation is CodegenFallback: every gram costs an
  * interpreted lambda round-trip (~µs), which made gram construction —
  * not hashing, not the joins — the dominant cost of the LSH dedup
  * pipeline. A native expression emits the grams in one tight loop per
  * row inside whole-stage codegen.
  *
  * Semantics are bit-identical to the higher-order originals (and thus
  * to the committed DuckDB oracles): code-point substrings via
  * `UTF8String.substringSQL`, space-joined word windows, and an empty
  * (non-null) array when the input is shorter than one gram.
  */
object Grams {

  /** All `n`-code-point substrings of `s`, in position order. */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < len - n + 1) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All `k`-element windows of `arr`, space-joined. Null elements are
    * skipped by the join exactly like `array_join(..., ' ')`. */
  def wordShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i < n - k + 1) {
      out(i) = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(words, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Set-shaped helpers for the exact-Jaccard verify stage: gram sets
  * live as one sorted `array<bigint>` per document (built in a single
  * codegen'd pass — no explode, no shuffle) and pairwise intersection
  * is a merge walk per candidate pair. This replaces the
  * explode→distinct→join→groupBy formulation whose row count was
  * |candidate pairs| × grams-per-doc — the measured bottleneck once
  * LSH banding produced a dense candidate graph. */
object GramSets {

  /** Sorted distinct [[MinHash.hash60]] values of a string array. */
  def hash60Set(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) { hs(m) = MinHash.hash60(s.getBytes); m += 1 }
      j += 1
    }
    java.util.Arrays.sort(hs, 0, m)
    // dedup in place
    var out = 0
    var i = 0
    while (i < m) {
      if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** |a ∩ b| of two ascending-sorted long arrays. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Literal-set membership counting for the language-ID heuristics:
  * the hit counts against a fixed stopword/trigram list are a per-row
  * measure, so they never need the explode → doc-keyed aggregate
  * round-trip (a shuffle of every token occurrence) — one hash-set
  * probe per element inside whole-stage codegen replaces it. */
object TextSets {

  /** Occurrences (duplicates counted) of `arr` elements in `set`. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && set.contains(s)) c += 1
      i += 1
    }
    c
  }

  /** Total occurrences (overlapping; every start position counts) of
    * the patterns in `s`, by direct byte search — no gram-array
    * materialization at all. UTF-8 is self-synchronizing, so a byte
    * match of a valid pattern encoding always lies on code-point
    * boundaries: byte counting equals code-point-window counting. */
  def strCountAny(s: UTF8String, pats: Array[Array[Byte]]): Long = {
    val b = s.getBytes
    var total = 0L
    var p = 0
    while (p < pats.length) {
      val pat = pats(p)
      if (pat.length > 0 && pat.length <= b.length) {
        val last = b.length - pat.length
        var i = 0
        while (i <= last) {
          var j = 0
          while (j < pat.length && b(i + j) == pat(j)) j += 1
          if (j == pat.length) total += 1
          i += 1
        }
      }
      p += 1
    }
    total
  }
}

/** `array_count_in(arr, array('a','b',…)) -> bigint` — occurrences of
  * the elements in a plan-time-literal string set. */
case class ArrayCountIn(child: Expression, targets: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "array_count_in"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](targets.size * 2)
    targets.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TextSets.countIn(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("targets", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextSets.countIn($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCountIn =
    copy(child = newChild)
}

/** `str_count_any(s, array('p1','p2',…)) -> bigint` — total overlapping
  * occurrences of the literal patterns in `s`. For distinct equal-width
  * patterns this equals counting the n-gram stream's members in the
  * pattern set — without building the gram array. */
case class StrCountAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "str_count_any"

  @transient private lazy val pats: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextSets.strCountAny(input.asInstanceOf[UTF8String], pats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("patterns", pats, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextSets.strCountAny($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): StrCountAny =
    copy(child = newChild)
}

/** `hash60_set(arr) -> array<bigint>` — sorted distinct 60-bit hashes
  * of the elements, one codegen'd pass per row. */
case class Hash60Set(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "hash60_set"

  override protected def nullSafeEval(input: Any): Any =
    GramSets.hash60Set(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GramSets.hash60Set($c);")

  override protected def withNewChildInternal(newChild: Expression): Hash60Set =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b) -> bigint` — merge-walk intersection
  * size of two sorted bigint arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  private val longArray = ArrayType(org.apache.spark.sql.types.LongType)

  override def inputTypes = Seq(longArray, longArray)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GramSets.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.GramSets.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `vec_match_count(a, b) -> bigint` — positions where two
  * equal-length bigint arrays agree (minhash-signature agreement for
  * sketch-estimated Jaccard). NULL on length mismatch. */
case class VecMatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {

  private val longArray = ArrayType(org.apache.spark.sql.types.LongType)

  override def inputTypes = Seq(longArray, longArray)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def prettyName: String = "vec_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var c = 0L
      var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
      c
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $c = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecMatchCount =
    copy(left = newLeft, right = newRight)
}

/** `char_ngrams(s, n) -> array<string>` — one loop per row, inside
  * whole-stage codegen. `n` is fixed at plan time (a literal in the
  * registered SQL function). */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, s"char_ngrams width must be positive, got $n")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    Grams.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Grams.charNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** `word_shingles(tokens, k) -> array<string>` — space-joined k-word
  * windows, inside whole-stage codegen. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0, s"word_shingles width must be positive, got $k")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Grams.wordShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Grams.wordShingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
