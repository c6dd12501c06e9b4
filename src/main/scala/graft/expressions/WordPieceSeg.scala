package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local WordPiece segmentation for the `wordpiece_*` family —
  * the BERT tokenizer's greedy longest-match-first word splitter
  * (Devlin et al. 2019, arXiv:1810.04805 §A; Schuster & Nakajima 2012
  * "Japanese and Korean voice search"), restricted to the word level
  * with the same bounded piece/word lengths as [[UnigramOps]] so the
  * DuckDB oracle can unroll the identical greedy walk step by step.
  *
  * `wordpiece_seg(word, pieces)` splits `word` left to right: at each
  * position it takes the LONGEST vocabulary piece (length ≤
  * [[WordPieceOps.MaxPiece]]) matching there — matched as-is at
  * position 0, and with the `##` continuation prefix everywhere else —
  * or fails the whole word (NULL = the `[UNK]` rule: one unknown token
  * for the entire word, BERT's behavior). Words longer than
  * [[WordPieceOps.MaxWord]] are NULL for the same reason. `pieces` is
  * one BINARY-SORTED string array holding initial pieces verbatim and
  * continuation pieces in their `##`-prefixed form; lookups
  * binary-search it — O(len × MaxPiece × log V) per word, no hash map
  * build, vocabulary on a one-row broadcast (the `unigram_seg`
  * convention).
  *
  * Greedy (not Viterbi) is the semantic difference from
  * `unigram_seg`: WordPiece commits to the longest local match even
  * when a shorter first piece would yield fewer total pieces. */
object WordPieceOps {

  val MaxPiece = 4
  val MaxWord = 16

  private val Hashes = UTF8String.fromString("##")

  private def binSearch(pieces: ArrayData, n: Int, key: UTF8String): Boolean = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = pieces.getUTF8String(mid).compareTo(key)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Greedy longest-match piece sequence (## forms included), or null
    * when the word is over-length or hits an unmatchable position. */
  def seg(word: UTF8String, pieces: ArrayData): ArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    if (n > MaxWord) return null
    val np = pieces.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      var l = math.min(MaxPiece, n - pos)
      var taken = -1
      while (l >= 1 && taken < 0) {
        val raw = word.substring(pos, pos + l)
        val key = if (pos == 0) raw else UTF8String.concat(Hashes, raw)
        if (binSearch(pieces, np, key)) taken = l else l -= 1
      }
      if (taken < 0) return null
      val raw = word.substring(pos, pos + taken)
      out += (if (pos == 0) raw else UTF8String.concat(Hashes, raw))
      pos += taken
    }
    new GenericArrayData(out.toArray)
  }
}

/** `wordpiece_seg(word STRING, pieces ARRAY<STRING> (binary-sorted,
  * continuation pieces ##-prefixed)) -> ARRAY<STRING>` — the greedy
  * longest-match piece path, or NULL for `[UNK]` words. */
case class WordPieceSeg(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_seg"

  override protected def nullSafeEval(w: Any, p: Any): Any =
    WordPieceOps.seg(w.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p) =>
      s"""${ev.value} = graft.expressions.WordPieceOps.seg($w, $p);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WordPieceSeg =
    copy(left = l, right = r)
}
