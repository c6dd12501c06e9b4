package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.functions.TextFns

/** Unit tests for the engine's native Catalyst expressions — the
  * codegen'd hot-path replacements for higher-order-function
  * formulations. Each test pins the exact semantics the DuckDB oracles
  * rely on (code-point grams, sorted distinct hash sets, strict-fold
  * dots, NULL on dimension mismatch).
  */
class ExpressionsSpec extends SparkSpecBase {

  private def one(sql: String): Row = {
    GraftFunctions.ensure(spark)
    spark.sql(s"SELECT $sql AS v").first()
  }

  test("char_ngrams: positions, short input, code points") {
    assert(one("char_ngrams('abcde', 4)").getSeq[String](0) == Seq("abcd", "bcde"))
    assert(one("char_ngrams('abc', 4)").getSeq[String](0) == Seq.empty)
    assert(one("char_ngrams('abcd', 4)").getSeq[String](0) == Seq("abcd"))
    // multi-byte code points count as one character
    assert(one("char_ngrams('äöüß', 3)").getSeq[String](0) == Seq("äöü", "öüß"))
    assert(one("char_ngrams(CAST(NULL AS STRING), 3)").isNullAt(0))
  }

  test("word_shingles: windows, short input") {
    assert(one("word_shingles(array('a','b','c','d'), 3)").getSeq[String](0)
      == Seq("a b c", "b c d"))
    assert(one("word_shingles(array('a','b'), 3)").getSeq[String](0) == Seq.empty)
  }

  test("char_ngrams/word_shingles match the higher-order formulation") {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
      .withColumn("norm", TextFns.normalizeText($"text"))
      .withColumn("words", TextFns.tokens($"text"))
    val diff = docs.select(
        expr("char_ngrams(norm, 4)").as("fast"),
        expr("transform(sequence(1, greatest(length(norm) - 3, 0)), i -> substring(norm, i, 4))").as("slow"),
        expr("word_shingles(words, 3)").as("wfast"),
        expr("CASE WHEN size(words) < 3 THEN array() ELSE transform(sequence(1, size(words) - 2), i -> array_join(slice(words, i, 3), ' ')) END").as("wslow"))
      .filter($"fast" =!= $"slow" || $"wfast" =!= $"wslow")
      .count()
    assert(diff === 0)
  }

  test("hash60_set: sorted, distinct, matches md5-prefix hash") {
    val got = one("hash60_set(array('x', 'y', 'x'))").getSeq[Long](0)
    val expect = Seq("x", "y")
      .map(s => graft.expressions.MinHash.hash60(s.getBytes("UTF-8"))).sorted
    assert(got == expect)
    assert(got == got.sorted && got.distinct == got)
  }

  test("sorted_intersect_count: merge walk") {
    assert(one("sorted_intersect_count(array(1L,3L,5L,7L), array(3L,4L,5L,9L))").getLong(0) == 2L)
    assert(one("sorted_intersect_count(array(1L), array(2L))").getLong(0) == 0L)
    assert(one("sorted_intersect_count(array(), array(1L))").getLong(0) == 0L)
  }

  test("array_count_in: occurrences against a literal set") {
    assert(one("array_count_in(array('a','b','a','c'), array('a','c'))").getLong(0) == 3L)
    assert(one("array_count_in(array(), array('a'))").getLong(0) == 0L)
    assert(one("array_count_in(CAST(NULL AS array<string>), array('a'))").isNullAt(0))
  }

  test("str_count_any: overlapping occurrences, multi-byte, matches gram counting") {
    // overlapping: 'ththt' holds 'tht' at positions 1 and 3
    assert(one("str_count_any('ththt', array('tht'))").getLong(0) == 2L)
    // multi-byte pattern in multi-byte text
    assert(one("str_count_any('canción y acción', array('ión'))").getLong(0) == 2L)
    assert(one("str_count_any('ab', array('abc'))").getLong(0) == 0L)
    // equivalence with the explicit gram-stream formulation on real docs
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val diff = Tables.documents(spark, sf)
      .select(TextFns.normalizeText($"text").as("norm"))
      .filter(length($"norm") >= 3)
      .select(
        expr("str_count_any(norm, array('the','he ',' th','ing','ión'))").as("fast"),
        expr("array_count_in(char_ngrams(norm, 3), array('the','he ',' th','ing','ión'))").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(diff === 0)
  }

  test("simhash32: bit-identical to the explode+sign-sum aggregate") {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val toks = Tables.documents(spark, sf).limit(100)
      .select($"doc_id", TextFns.tokens($"text").as("w"))
      .filter(size($"w") > 0)
    val sums = (0 until 32).map(j =>
      sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$j"))
    val agg = toks
      .select($"doc_id", explode($"w").as("t"))
      .select($"doc_id", TextFns.hash60($"t").as("h"))
      .groupBy($"doc_id")
      .agg(sums.head, sums.tail: _*)
      .select($"doc_id",
        (0 until 32)
          .map(j => when(col(s"s$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce(_ + _).as("slow"))
    val diff = toks.select($"doc_id", expr("simhash32(w)").as("fast"))
      .join(agg, "doc_id")
      .filter($"fast" =!= $"slow")
      .count()
    assert(diff === 0)
    // empty array is total-vote-negative: all counters 0, no bit set
    assert(one("simhash32(array())").getLong(0) == 0L)
  }

  test("vec_dot: strict fold; NULL on dimension mismatch") {
    assert(one("vec_dot(array(1.0d,2.0d), array(3.0d,4.0d))").getDouble(0) == 11.0)
    assert(one("vec_dot(array(1.0d,2.0d), array(3.0d))").isNullAt(0))
    assert(one("vec_dot(CAST(NULL AS array<double>), array(1.0d))").isNullAt(0))
  }

  test("vec_normalize: unit norm, bit-identical to transform formulation") {
    val r = one("vec_dot(vec_normalize(array(3.0d,4.0d)), vec_normalize(array(3.0d,4.0d)))")
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    import spark.implicits._
    GraftFunctions.ensure(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(expr("CAST(embedding AS array<double>)").as("ed"))
      .withColumn("nrm", expr("sqrt(vec_dot(ed, ed))"))
      .select(expr("vec_normalize(ed)").as("fast"),
        expr("transform(ed, x -> x / nrm)").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(diff === 0)
  }

  test("pq_argmin: strict min, ascending-cell tie-break, malformed NULL") {
    // codebook: cells 3,7 with centroids (1,0) and (0,1); cvv = 1 each
    val cb = "array(1.0D,0.0D,0.0D,1.0D), array(1.0D,1.0D), array(3L,7L)"
    // sv=(1,0): scores 1-2= -1 vs 1-0 = 1 -> cell 3
    assert(one(s"pq_argmin(array(1.0D,0.0D), $cb)").getLong(0) === 3L)
    // sv=(0,1): -> cell 7
    assert(one(s"pq_argmin(array(0.0D,1.0D), $cb)").getLong(0) === 7L)
    // equidistant sv=(0.5,0.5): identical scores -> smallest cell (3)
    assert(one(s"pq_argmin(array(0.5D,0.5D), $cb)").getLong(0) === 3L)
    // malformed: flat length != k*dim -> NULL
    assert(one("pq_argmin(array(1.0D,0.0D), array(1.0D,0.0D,0.0D), array(1.0D,1.0D), array(3L,7L))").isNullAt(0))
    // empty codebook -> NULL
    assert(one("pq_argmin(array(1.0D,0.0D), array(), array(), array())").isNullAt(0))
    assert(one(s"pq_argmin(CAST(NULL AS ARRAY<DOUBLE>), $cb)").isNullAt(0))
  }

  test("sq8_codes: linear bucketing, clamps, zero-step, mismatch NULL") {
    // dim stats: min=0, step=(1-0)/255 — value 1.0 lands exactly on 255
    val st = "array(0.0D), array(1.0D / 255.0D)"
    assert(one(s"sq8_codes(array(0.0D), $st)").getSeq[Int](0) === Seq(0))
    assert(one(s"sq8_codes(array(1.0D), $st)").getSeq[Int](0) === Seq(255))
    assert(one(s"sq8_codes(array(0.5D), $st)").getSeq[Int](0) === Seq(127))
    // out-of-corpus reuse: below min / above max clamp to the edges
    assert(one(s"sq8_codes(array(-1.0D), $st)").getSeq[Int](0) === Seq(0))
    assert(one(s"sq8_codes(array(9.0D), $st)").getSeq[Int](0) === Seq(255))
    // constant dimension (step 0) encodes as 0
    assert(one("sq8_codes(array(5.0D), array(5.0D), array(0.0D))")
      .getSeq[Int](0) === Seq(0))
    // dimension mismatch must surface as NULL
    assert(one("sq8_codes(array(1.0D, 2.0D), array(0.0D), array(1.0D))")
      .isNullAt(0))
    assert(one(s"sq8_codes(CAST(NULL AS ARRAY<DOUBLE>), $st)").isNullAt(0))
  }

  test("sq8_adc: mid-rise reconstruction dot, mismatch NULL") {
    // codes (0, 255) over min=0 step=1/255 reconstruct to (0.5/255,
    // 255.5/255); q=(1,1) -> dot = 256/255
    val got = one(
      "sq8_adc(array(1.0D, 1.0D), array(0, 255), " +
        "array(0.0D, 0.0D), array(1.0D / 255.0D, 1.0D / 255.0D))").getDouble(0)
    assert(math.abs(got - 256.0 / 255.0) < 1e-12)
    assert(one("sq8_adc(array(1.0D), array(0, 1), array(0.0D), array(1.0D))")
      .isNullAt(0))
  }

  test("bloom: no false negatives ever; FPR tracks the sizing math") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    // build over 100k keys, probe all of them: a Bloom filter may lie
    // positively, NEVER negatively — one false negative is a bug
    val keys = spark.range(0, 100000).select($"id".as("k"))
    keys.agg(expr("bloom_build(k)").as("bf")).createOrReplaceTempView("bf_t")
    val misses = keys
      .filter(expr("NOT bloom_contains((SELECT bf FROM bf_t), k)")).count()
    assert(misses === 0)
    // disjoint probe range: with m=2^20 bits, n=100k, h=4 the analytic
    // FPR is (1-e^(-hn/m))^h ≈ 1.2% — assert an order-of-magnitude band
    val fp = spark.range(1000000, 1100000).select($"id".as("k"))
      .filter(expr("bloom_contains((SELECT bf FROM bf_t), k)")).count()
    assert(fp > 0 && fp < 5000, s"fp=$fp outside the plausible band")
  }

  test("bloom: partial bitmaps OR-merge to the same filter as one pass") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    // 1 partition vs 8: identical serialized bitmap bytes — merge is
    // exactly bitwise OR, so partitioning cannot change the filter
    val one = spark.range(0, 5000).repartition(1)
      .agg(expr("bloom_build(id)")).first().getAs[Array[Byte]](0)
    val eight = spark.range(0, 5000).repartition(8)
      .agg(expr("bloom_build(id)")).first().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, eight))
    assert(one.length === (1 << 20) / 8) // the documented 128 KiB
  }

  test("mg sketch: capacity bound holds and heavy hitters always survive") {
    import spark.implicits._
    GraftFunctions.ensure(spark)
    // adversarial stream: 2000-term vocabulary (≫ the 64-counter
    // capacity) of singletons, plus one term at ~5% frequency — far
    // above the N/64 survival guarantee
    val rows = (0 until 2000).map(i => s"noise_$i") ++ Seq.fill(100)("heavy")
    for (parts <- Seq(1, 7, 32)) {
      val cands = rows.toDF("term").repartition(parts)
        .agg(expr("mg_topk_candidates(term)")).first().getSeq[String](0)
      assert(cands.size <= 64, s"parts=$parts: ${cands.size} candidates")
      assert(cands.contains("heavy"), s"parts=$parts lost the heavy hitter")
    }
  }

  test("sq8: encode+adc of a corpus vector approximates the exact dot") {
    // quantization error per dim ≤ step/2 = (max-min)/510 — a planted
    // 2-dim check that the fused ADC tracks the exact dot within the
    // analytic bound |err| ≤ Σ |q_i|·step_i/2
    val q = "array(0.6D, 0.8D)"
    val v = "array(0.31D, 0.77D)"
    val st = "array(0.0D, 0.0D), array(1.0D / 255.0D, 1.0D / 255.0D)"
    val got = one(s"sq8_adc($q, sq8_codes($v, $st), $st)").getDouble(0)
    val exact = 0.6 * 0.31 + 0.8 * 0.77
    assert(math.abs(got - exact) <= (0.6 + 0.8) / 510.0 + 1e-12)
  }

  test("high_nibble_counts: segment split, remainder in total only") {
    // 64 chars of '9' (high) → 32 segments of 2, every count 2, total 64
    val all9 = one(s"high_nibble_counts('${"9" * 64}')").getSeq[Int](0)
    assert(all9.take(32).forall(_ == 2) && all9(32) === 64)
    // 66 chars: segLen = 66/32 = 2 → 2 remainder chars count ONLY in
    // the total (the substring(j*seg+1, seg) oracle split)
    val rem = one(s"high_nibble_counts('${"9" * 66}')").getSeq[Int](0)
    assert(rem.take(32).forall(_ == 2) && rem(32) === 66)
    // low chars ('0'-'7') never count; 'A'-'F' do
    val mixed = one(s"high_nibble_counts('${"0A" * 32}')").getSeq[Int](0)
    assert(mixed.take(32).forall(_ == 1) && mixed(32) === 32)
    // shorter than 32 chars: segLen 0, counts 0, total still exact
    val short = one("high_nibble_counts('FF07')").getSeq[Int](0)
    assert(short.take(32).forall(_ == 0) && short(32) === 2)
  }

  test("letter_counts: a-z histogram, multi-byte and non-letters ignored") {
    val got = one("letter_counts('abba z9 éz')").getSeq[Long](0)
    assert(got(0) === 2 && got(1) === 2 && got(25) === 2) // a, b, z
    assert(got(26) === 6) // total letters; digits/spaces/é excluded
    assert(got.slice(2, 25).forall(_ == 0))
    // matches the replace-length formulation the oracle keeps
    val viaReplace = one(
      "length('abba z9 éz') - length(replace('abba z9 éz', 'a', ''))")
      .getInt(0)
    assert(got(0) === viaReplace.toLong)
  }
}
