package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** Registers the engine's native Catalyst expressions as SQL functions
  * on a session, making them usable from `expr(...)` / `spark.sql`
  * exactly like built-ins (SURVEY §2.9 — preference order: built-in >
  * native `Expression` > UDF).
  *
  * Registration goes through the session's `FunctionRegistry`; [[ensure]]
  * registers create-or-replace on its FIRST call per session (tracked by
  * a weak per-session marker), so a pre-existing temp function that
  * happens to share a name can never silently shadow the engine's
  * expression, while the defensive `ensure` calls sprinkled through the
  * operators stay free of re-registration work and warnings. The equivalent
  * cluster-deploy path is `SparkSessionExtensions.injectFunction` from a
  * `spark.sql.extensions` class — same builders, applied at session
  * construction; [[GraftExtensions]] provides it.
  */
object GraftFunctions {

  private def intLit(fn: String, e: Expression): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$fn: gram width must be an INT literal, got $other")
  }

  private def stringArrayLit(fn: String, e: Expression): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
      elems.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(
          v, org.apache.spark.sql.types.StringType) if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"$fn: target set must be non-null string literals, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: target set must be an array(...) literal, got $other")
  }

  /** (name, implementing class for ExpressionInfo, builder). */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("vec_dot", classOf[VecDot], es => VecDot(es(0), es(1))),
    ("vec_normalize", classOf[VecNormalize], es => VecNormalize(es(0))),
    ("minhash_sig", classOf[MinHashSig], es => MinHashSig(es(0))),
    ("char_ngrams", classOf[CharNgrams],
      es => CharNgrams(es(0), intLit("char_ngrams", es(1)))),
    ("word_shingles", classOf[WordShingles],
      es => WordShingles(es(0), intLit("word_shingles", es(1)))),
    ("hash60_set", classOf[Hash60Set], es => Hash60Set(es(0))),
    ("vec_match_count", classOf[VecMatchCount],
      es => VecMatchCount(es(0), es(1))),
    ("sorted_intersect_count", classOf[SortedIntersectCount],
      es => SortedIntersectCount(es(0), es(1))),
    ("simhash32", classOf[SimHash32], es => SimHash32(es(0))),
    ("array_count_in", classOf[ArrayCountIn],
      es => ArrayCountIn(es(0), stringArrayLit("array_count_in", es(1)))),
    ("str_count_any", classOf[StrCountAny],
      es => StrCountAny(es(0), stringArrayLit("str_count_any", es(1)))),
    ("pq_argmin", classOf[PqArgmin],
      es => PqArgmin(es(0), es(1), es(2), es(3))),
    ("pq_adist", classOf[PqAdist],
      es => PqAdist(es(0), es(1), es(2), es(3))),
    ("pq_min_score", classOf[PqMinScore],
      es => PqMinScore(es(0), es(1), es(2))),
    ("sq8_codes", classOf[Sq8Codes], es => Sq8Codes(es(0), es(1), es(2))),
    ("sq8_adc", classOf[Sq8Adc], es => Sq8Adc(es(0), es(1), es(2), es(3))),
    ("bloom_build", classOf[BloomBuild], es => BloomBuild(es(0))),
    ("bloom_contains", classOf[BloomContains],
      es => BloomContains(es(0), es(1))),
    ("mg_topk_candidates", classOf[MgTopKCandidates],
      es => MgTopKCandidates(es(0))),
    ("bpe_apply", classOf[BpeApply], es => BpeApply(es(0), es(1))),
    ("unigram_seg", classOf[UnigramSeg],
      es => UnigramSeg(es(0), es(1), es(2))),
    ("wordpiece_seg", classOf[WordPieceSeg],
      es => WordPieceSeg(es(0), es(1))),
    ("high_nibble_counts", classOf[HighNibbleCounts],
      es => HighNibbleCounts(es(0))),
    ("letter_counts", classOf[LetterCounts], es => LetterCounts(es(0))),
    ("cc_fragments", classOf[CcFragments], es => CcFragments(es(0))))

  /** Sessions already registered — weak keys so dropped sessions don't
    * leak. All access happens under the map's monitor: concurrent
    * callers (spec suites share one session across threads) must not
    * observe the marker before every builder is registered, and a
    * failed registration must leave the marker UNSET so the next call
    * retries instead of silently never registering. */
  private val registered =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def ensure(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.containsKey(spark)) {
      val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      builders.foreach { case (name, _, b) =>
        registry.createOrReplaceTempFunction(name, b, "built-in")
      }
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }
}

/** `spark.sql.extensions`-loadable variant for cluster deployments:
  * `--conf spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, cls, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        b))
    }
}
