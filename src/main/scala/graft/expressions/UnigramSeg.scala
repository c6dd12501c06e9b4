package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local unigram-LM Viterbi segmentation for the
  * `text_unigram_*` family (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model, restricted to the word level with
  * bounded piece length so the DuckDB oracle can unroll the same DP
  * exactly).
  *
  * `unigram_seg(word, pieces, scores)` segments `word` into the
  * highest-scoring sequence of vocabulary pieces, where `pieces` is a
  * BINARY-SORTED string array and `scores` its aligned quantized
  * log-probabilities as scaled BIGINTs (ln-ratio × 10⁹, rounded
  * half-up — integer DP sums, so score comparisons are EXACT on both
  * engines; the one float step is the quantization itself, the
  * documented `text_lm_*` convention). DP recurrence over character
  * positions with piece length ≤ [[UnigramOps.MaxPiece]]; ties break
  * toward the SMALLEST split point (the oracle's
  * `ORDER BY score DESC, j ASC` row_number), matched here by strict
  * `>` improvement while scanning j ascending. Unreachable words
  * (a character outside the vocabulary) return NULL and the caller
  * falls back to per-character counting.
  *
  * The vocabulary rides a one-row broadcast (the `bpe_apply` packed
  * convention) and lookups binary-search the sorted piece array —
  * O(len × MaxPiece × log V) per word, no per-row hash map build. */
object UnigramOps {

  /** Maximum piece length — the DP looks back at most this far, and
    * the oracle unrolls candidate joins per (position, length). */
  val MaxPiece = 4

  /** Maximum word length eligible for Viterbi segmentation — the
    * oracle unrolls one DP CTE per position up to this bound; longer
    * words count one token per character (engine and oracle share the
    * rule). */
  val MaxWord = 16

  private def binSearch(pieces: ArrayData, n: Int, key: UTF8String): Int = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = pieces.getUTF8String(mid).compareTo(key)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Viterbi path over `word`, or null when no full segmentation
    * exists. Returns the piece sequence in reading order. */
  def seg(word: UTF8String, pieces: ArrayData, scores: ArrayData): ArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    if (n > MaxWord) return null
    val np = pieces.numElements()
    val NEG = java.lang.Long.MIN_VALUE
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    dp(0) = 0L
    while (i <= n) { dp(i) = NEG; back(i) = -1; i += 1 }
    i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        if (dp(j) != NEG) {
          val idx = binSearch(pieces, np, word.substring(j, i))
          if (idx >= 0) {
            val sc = dp(j) + scores.getLong(idx)
            // strict > with j ascending keeps the SMALLEST j on ties
            // (the oracle's ORDER BY score DESC, j ASC)
            if (sc > dp(i)) { dp(i) = sc; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (dp(n) == NEG) return null
    var count = 0
    var pos = n
    while (pos > 0) { count += 1; pos = back(pos) }
    val out = new Array[Any](count)
    pos = n
    var w = count - 1
    while (pos > 0) {
      out(w) = word.substring(back(pos), pos)
      w -= 1
      pos = back(pos)
    }
    new GenericArrayData(out)
  }
}

/** `unigram_seg(word STRING, pieces ARRAY<STRING> (binary-sorted),
  * scores ARRAY<BIGINT>) -> ARRAY<STRING>` — the Viterbi piece path,
  * or NULL when the word is longer than [[UnigramOps.MaxWord]] or not
  * coverable. */
case class UnigramSeg(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes =
    Seq(StringType, ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_seg"

  override protected def nullSafeEval(w: Any, p: Any, sc: Any): Any =
    UnigramOps.seg(w.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], sc.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = nullSafeCodeGen(ctx, ev, (w, p, sc) =>
      s"""${ev.value} = graft.expressions.UnigramOps.seg($w, $p, $sc);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    f
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramSeg =
    copy(first = f, second = s, third = t)
}
