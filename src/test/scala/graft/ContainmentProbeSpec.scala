package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.functions.TextFns._

/** Pins the round-10 K-rarest probe selection in `dedup_containment`:
  * candidate generation joins only each doc's K rarest kept grams
  * (K = 8, ordered by global df then hash) against the full kept
  * postings. The pigeonhole bound says a pair is guaranteed to
  * surface when containment ≥ 1 − K/|grams(inner)|, and full-
  * containment pairs are identical to the unrestricted generator by
  * construction; this spec proves that ON THE FIXTURE the selection
  * loses nothing at the shipped 0.9 threshold: the surviving pair set
  * equals what the unrestricted all-kept × all-kept generator yields.
  */
class ContainmentProbeSpec extends SparkSpecBase {

  test("K-rarest probe yields exactly the unrestricted generator's " +
      "surviving pairs at threshold 0.9") {
    graft.expressions.GraftFunctions.ensure(spark)
    import spark.implicits._
    // unrestricted reference: same shingles/df-cap/threshold as the op
    // (knob values pinned here on purpose — a knob change must come
    // back to this spec), candidates from ALL kept postings
    val postings = ops.Dedup.wordGrams(Tables.documents(spark, sf))
      .select($"doc_id", explode($"grams").as("g"))
      .select($"doc_id", hash60($"g").as("gh"))
      .distinct().cache()
    val rare = postings.groupBy($"gh").agg(count(lit(1)).as("df"))
      .filter($"df" <= 64).select($"gh")
    val kept = postings.join(rare, "gh").cache()
    val cand = kept.as("l").join(kept.as("r"),
        $"l.gh" === $"r.gh" && $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("doc_a"), $"r.doc_id".as("doc_b"))
      .distinct()
    val gsets = ops.Dedup.wordGrams(Tables.documents(spark, sf))
      .select($"doc_id", expr("hash60_set(grams)").as("gs")).cache()
    val ref = cand
      .join(gsets.select($"doc_id".as("doc_a"), $"gs".as("ga")), "doc_a")
      .join(gsets.select($"doc_id".as("doc_b"), $"gs".as("gb")), "doc_b")
      .select($"doc_a", $"doc_b",
        roundHalfUp(lit(1.0) * expr("sorted_intersect_count(ga, gb)") /
          least(size($"ga"), size($"gb")), 6).as("c"))
      .filter($"c" >= 0.9)
      .select($"doc_a", $"doc_b")
    val shipped = SparkEntry.queries("dedup_containment")(spark, sf)
      .select(least($"doc_inner", $"doc_outer").as("doc_a"),
        greatest($"doc_inner", $"doc_outer").as("doc_b"))
    val missed = ref.except(shipped).count()
    val spurious = shipped.except(ref).count()
    assert(missed === 0,
      s"K-rarest probe missed $missed surviving pair(s) the unrestricted " +
        "generator finds — widen ContainProbeK or lower the threshold bound")
    assert(spurious === 0,
      s"shipped op emitted $spurious pair(s) the unrestricted generator " +
        "does not — probe selection must only shrink the candidate set")
  }
}
