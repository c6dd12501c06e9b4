package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.Exact
import graft.functions.Loan

/** ScalaCheck properties for the semantics-sensitive points SURVEY
  * §7.4 calls out — the places where DuckDB and Spark dialects (or
  * floating point) could silently disagree. Each property drives the
  * REAL column expressions through a tiny DataFrame so what's tested
  * is the Catalyst evaluation, not a Scala re-implementation.
  */
class PropertySpec extends SparkSpecBase {

  private def check(p: Prop, tests: Int = 20): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(r.passed, r.status.toString)
  }

  test("F3: engine regex replace-all removes every whitespace run") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { ss =>
      val got = ss.toDF("v")
        .select(regexp_replace(lower($"v"), "\\s+", "").as("r"))
        .collect().map(_.getString(0)).toSeq
      got == ss.map(_.toLowerCase.replaceAll("\\s+", ""))
    }, tests = 10)
  }

  test("F12: monthDiff counts calendar-boundary crossings, not fractions") {
    import spark.implicits._
    val dates = for {
      y <- Gen.choose(1990, 2035); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield LocalDate.of(y, m, d)
    check(Prop.forAll(Gen.listOfN(25, Gen.zip(dates, dates))) { ps =>
      val got = ps.map { case (a, b) =>
        (java.sql.Date.valueOf(a), java.sql.Date.valueOf(b)) }
        .toDF("a", "b").select(Loan.monthDiff($"a", $"b").as("r"))
        .collect().map(_.getLong(0)).toSeq
      val want = ps.map { case (a, b) =>
        (b.getYear * 12L + b.getMonthValue) - (a.getYear * 12L + a.getMonthValue) }
      // day-of-month never matters (boundary-crossing semantics)
      val gotShifted = ps.map { case (a, b) =>
        (java.sql.Date.valueOf(a.withDayOfMonth(28)),
          java.sql.Date.valueOf(b.withDayOfMonth(1))) }
        .toDF("a", "b").select(Loan.monthDiff($"a", $"b").as("r"))
        .collect().map(_.getLong(0)).toSeq
      got == want && gotShifted == want
    }, tests = 10)
  }

  test("O3: union + distinct has SQL UNION cardinality") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 30)),
      Gen.listOf(Gen.choose(0, 30))) { (xs, ys) =>
      xs.toDF("v").union(ys.toDF("v")).distinct().count() ==
        (xs ++ ys).distinct.size.toLong
    }, tests = 10)
  }

  test("A10: array_sort(collect_list) is deterministic under any row order") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(25, Gen.alphaNumStr.suchThat(_.nonEmpty)),
      Gen.long) { (xs, seed) =>
      def collected(seq: Seq[String]) =
        seq.toDF("v").repartition(3)
          .agg(array_sort(collect_list($"v")).as("r"))
          .first().getSeq[String](0).toList
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      collected(xs) == xs.sorted && collected(shuffled) == xs.sorted
    }, tests = 10)
  }

  test("simhash32: matches a direct per-token vote tally on random docs") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensure(spark)
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(8, Gen.listOfN(12, word))) { docs =>
      val got = docs.map(ws => Tuple1(ws)).toDF("w")
        .select(expr("simhash32(w)").as("r"))
        .collect().map(_.getLong(0)).toSeq
      val want = docs.map { ws =>
        val sums = new Array[Int](32)
        for (w <- ws; b <- 0 until 32) {
          val h = graft.expressions.MinHash.hash60(w.getBytes("UTF-8"))
          if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        }
        (0 until 32).map(b => if (sums(b) > 0) 1L << b else 0L).sum
      }
      got == want
    }, tests = 10)
  }

  test("str_count_any: equals sliding-window membership counting") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensure(spark)
    // alphabet of 3 symbols makes overlaps and repeats likely; include
    // a multi-byte symbol to exercise UTF-8 alignment
    val sym = Gen.oneOf("a", "b", "é")
    val text = Gen.listOfN(30, sym).map(_.mkString)
    val pat = Gen.listOfN(3, sym).map(_.mkString)
    check(Prop.forAll(text, pat) { (t, p) =>
      val got = Seq(t).toDF("v")
        .select(expr(s"str_count_any(v, array('$p'))").as("r"))
        .first().getLong(0)
      val want = t.sliding(3).count(_ == p).toLong
      got == want
    }, tests = 30)
  }

  test("roundHalfUp: evaluates the plain IEEE floor formula exactly") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(40, Gen.chooseNum(-1e6, 1e6))) { ds =>
      val got = ds.toDF("v")
        .select(Exact.roundHalfUp($"v", 2).as("r"))
        .collect().map(_.getDouble(0)).toSeq
      got == ds.map(v => math.floor(v * 100 + 0.5) / 100)
    }, tests = 10)
  }

  test("high_nibble_counts equals the substring/regex formulation on random hex") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensure(spark)
    val hexChar = Gen.oneOf("0123456789ABCDEF".toSeq)
    val hexStr = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, hexChar).map(_.mkString))
    check(Prop.forAll(Gen.listOfN(10, hexStr)) { ss =>
      val rows = ss.toDF("hexp")
        .selectExpr("hexp", "high_nibble_counts(hexp) AS prof")
        .collect()
      rows.forall { r =>
        val hexp = r.getString(0)
        val prof = r.getSeq[Int](1)
        val seg = hexp.length / 32
        val expSegs = (0 until 32).map { j =>
          hexp.slice(j * seg, j * seg + seg).count(c => c > '7')
        }
        val expTot = hexp.count(c => c > '7')
        prof.take(32) == expSegs && prof(32) == expTot
      }
    }, tests = 10)
  }

  test("letter_counts equals per-letter replace counting on random text") {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensure(spark)
    val txt = Gen.choose(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaLowerChar, 2 -> Gen.oneOf(' ', '9', 'é', 'Z', '.')))
        .map(_.mkString))
    check(Prop.forAll(Gen.listOfN(10, txt)) { ss =>
      val rows = ss.toDF("t")
        .selectExpr("t", "letter_counts(t) AS lc").collect()
      rows.forall { r =>
        val t = r.getString(0)
        val lc = r.getSeq[Long](1)
        ('a' to 'z').zipWithIndex.forall { case (c, i) =>
          lc(i) == t.count(_ == c).toLong
        } && lc(26) == t.count(c => c >= 'a' && c <= 'z').toLong
      }
    }, tests = 10)
  }
}
