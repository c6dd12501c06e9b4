package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.GraftFunctions
import graft.functions.Exact._
import graft.functions.TextFns._

/** [EXT] Data-shape diagnostics — the measurements that DRIVE the
  * engine's scale decisions (broadcast vs shuffle, plain vs salted
  * aggregate, AQE skew thresholds), surfaced as a queryable report
  * instead of folklore.
  *
  * Scale design: per analyzed key, one map-side-combined count shuffle
  * (the same cost as the aggregate it advises on) reduced to a single
  * summary row — the whole report is O(#key columns) rows regardless
  * of data size. At 100 TB this is the cheap pre-flight a pipeline
  * runs once per ingest to decide its join strategy, not a per-query
  * cost.
  */
object Diagnostics {

  /** One summary row for a join-key column: key cardinality, the
    * widest key, the interpolated p99 width, mean width, and the
    * max/mean skew ratio (the number that says "salt this key"). */
  private def keyWidthStats(df: DataFrame, keyCol: String,
                            label: String): DataFrame = {
    val widths = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("w"))
    widths
      .agg(count(lit(1)).as("n_keys"), max(col("w")).as("max_width"),
        roundHalfUp(expr("percentile(w, 0.99)"), 6).as("p99_width"),
        (lit(1.0) * sum(col("w")) / count(lit(1))).as("avg_raw"),
        (lit(1.0) * max(col("w")) * count(lit(1)) / sum(col("w"))).as("skew_raw"))
      .select(lit(label).as("join_key"), col("n_keys"), col("max_width"),
        col("p99_width"),
        roundHalfUp(col("avg_raw"), 6).as("avg_width"),
        roundHalfUp(col("skew_raw"), 6).as("skew_ratio"))
  }

  /** Key-width skew report over the engine's join keys. */
  private def diagSkew(s: SparkSession, d: String): DataFrame = {
    keyWidthStats(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey")
      .unionByName(
        keyWidthStats(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
      .unionByName(
        keyWidthStats(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
      .unionByName(
        keyWidthStats(Tables.events(s, d), "user_id", "events.user_id"))
      .orderBy(col("join_key"))
  }

  /** Oracle twin of [[keyWidthStats]] for one (table, key). */
  private def keyStatsSql(table: String, key: String): String =
    s"""SELECT '$table.$key' AS join_key,
       |  COUNT(*) AS n_keys, MAX(w) AS max_width,
       |  ${roundHalfUpSql("quantile_cont(w, 0.99)", 6)} AS p99_width,
       |  ${roundHalfUpSql("1.0 * SUM(w) / COUNT(*)", 6)} AS avg_width,
       |  ${roundHalfUpSql("1.0 * MAX(w) * COUNT(*) / SUM(w)", 6)} AS skew_ratio
       |FROM (SELECT $key, COUNT(*) AS w FROM $table GROUP BY 1)""".stripMargin

  private val EmbDims = 64

  /** Embedding-distribution drift between two ingest batches — the
    * model-monitoring check a training pipeline runs before trusting a
    * new embedding batch. Batches are two deterministic md5-hash
    * halves of `embeddings` (a real pipeline has an ingest-batch
    * column); per label, each half's centroid is the element-wise
    * DECIMAL-exact mean (posexplode, same parity recipe as the k-means
    * trainer), and drift is the cosine between the two half-centroids
    * — 1.0 = stable distribution, lower = the label's embedding cloud
    * moved. Shuffle cost: one (label, half, dim) aggregate — rows ×
    * dims keyed states, map-side combined; the centroid table itself
    * is labels × dims, trivially small at any corpus size. */
  private def diagEmbeddingDrift(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.ensure(s)
    import s.implicits._
    val halves = Tables.embeddings(s, d)
      .select($"vec_id", $"label", $"embedding",
        (hash60(concat(lit("drift:"), $"vec_id".cast("string"))) % 2).as("half"))
    val cents = halves
      .select($"label", $"half", posexplode($"embedding"))
      .groupBy($"label", $"half", $"pos")
      .agg(
        (sum($"col".cast("double").cast("decimal(27,18)")).cast("double") /
          count(lit(1))).as("m"),
        count(lit(1)).as("n"))
      .groupBy($"label", $"half")
      .agg(max($"n").as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
          .as("cv"))
    cents.filter($"half" === 0)
      .select($"label", $"n_vecs".as("n_a"), $"cv".as("ca"))
      .join(cents.filter($"half" === 1)
        .select($"label", $"n_vecs".as("n_b"), $"cv".as("cb")), "label")
      .select($"label", $"n_a", $"n_b",
        roundHalfUp(expr("vec_dot(ca, cb)") /
          (sqrt(expr("vec_dot(ca, ca)")) * sqrt(expr("vec_dot(cb, cb)"))), 6)
          .as("drift_cosine"))
      .orderBy($"label")
  }

  private def driftOracle: String = {
    val cos = s"${Similarity.dotSql("a.cv", "b.cv")} / " +
      s"(sqrt(${Similarity.dotSql("a.cv", "a.cv")}) * " +
      s"sqrt(${Similarity.dotSql("b.cv", "b.cv")}))"
    s"""WITH halves AS (
       |  SELECT vec_id, label, embedding,
       |    ${hash60Sql("'drift:' || vec_id")} % 2 AS half
       |  FROM embeddings
       |),
       |m AS (
       |  SELECT label, half, j,
       |    CAST(SUM(CAST(CAST(embedding[j + 1] AS DOUBLE) AS DECIMAL(27,18))) AS DOUBLE)
       |      / COUNT(*) AS m,
       |    COUNT(*) AS n
       |  FROM halves CROSS JOIN range(0, $EmbDims) t(j)
       |  GROUP BY label, half, j
       |),
       |c AS (
       |  SELECT label, half, MAX(n) AS n_vecs, list(m ORDER BY j ASC) AS cv
       |  FROM m GROUP BY label, half
       |)
       |SELECT a.label, a.n_vecs AS n_a, b.n_vecs AS n_b,
       |  ${roundHalfUpSql(cos, 6)} AS drift_cosine
       |FROM c a JOIN c b ON a.label = b.label AND a.half = 0 AND b.half = 1
       |ORDER BY a.label""".stripMargin
  }

  /** Event-time lateness profile — the measurement that SETS the
    * watermark delay: per user (event_id = ingest order), lateness is
    * the running-max event time minus this event's time; the report
    * buckets it (on-time / <1 m / <10 m / <1 h / ≥1 h) with counts,
    * shares, and the worst case. A stream whose p-max lateness is
    * 40 min needs `withWatermark(_, "1 hour")`, not folklore.
    *
    * Scale: ONE user-keyed window shuffle (running max rides ingest
    * order per key — never a global sort), then a map-side-combined
    * aggregate onto ≤ 5 bucket rows; the share window runs over those
    * 5 rows. */
  private[graft] def latenessProfile(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val late = events
      .select($"user_id", $"event_id", $"ts")
      .withColumn("late_us",
        unix_micros(max($"ts").over(w)) - unix_micros($"ts"))
    val bucket = when($"late_us" === 0, "a_on_time")
      .when($"late_us" <= 60L * 1000000L, "b_under_1m")
      .when($"late_us" <= 600L * 1000000L, "c_under_10m")
      .when($"late_us" <= 3600L * 1000000L, "d_under_1h")
      .otherwise("e_over_1h")
    late.select(bucket.as("lateness_bucket"), $"late_us")
      .groupBy($"lateness_bucket")
      .agg(count(lit(1)).as("n_events"), max($"late_us").as("max_late_us"))
      .withColumn("share", roundHalfUp(
        $"n_events".cast("double") / sum($"n_events").over(all).cast("double"),
        6))
      .orderBy($"lateness_bucket")
  }

  private def diagLateness(s: SparkSession, d: String): DataFrame =
    latenessProfile(Tables.events(s, d))

  private def latenessOracle: String =
    s"""WITH late AS (
       |  SELECT CASE
       |      WHEN late_us = 0 THEN 'a_on_time'
       |      WHEN late_us <= 60000000 THEN 'b_under_1m'
       |      WHEN late_us <= 600000000 THEN 'c_under_10m'
       |      WHEN late_us <= 3600000000 THEN 'd_under_1h'
       |      ELSE 'e_over_1h' END AS lateness_bucket,
       |    late_us
       |  FROM (
       |    SELECT epoch_us(MAX(ts) OVER (PARTITION BY user_id
       |        ORDER BY event_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |      - epoch_us(ts) AS late_us
       |    FROM events
       |  )
       |)
       |SELECT lateness_bucket, COUNT(*) AS n_events,
       |  MAX(late_us) AS max_late_us,
       |  ${roundHalfUpSql(
        "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE)", 6)}
       |    AS share
       |FROM late
       |GROUP BY lateness_bucket
       |ORDER BY lateness_bucket""".stripMargin

  private val PcaRounds = 8
  private val Dec18 = org.apache.spark.sql.types.DecimalType(27, 18)

  /** Top principal component of the embedding cloud by power
    * iteration — the whitening/compression pre-flight (is the space
    * effectively low-rank? which axis dominates?).
    *
    * Scale: the centered covariance needs one number per (i,j) pair —
    * exploding N·d² pair ROWS through a shuffle (even map-side
    * combined) pays row machinery per product, so instead each
    * partition accumulates the d(d+1)/2 upper-triangle running sums
    * imperatively (exactly `RowMatrix.computeGramianMatrix`'s
    * design — the sanctioned per-partition-imperative case) and emits
    * ONE d×d partial; partials reduce to the driver. The d×d matrix
    * (64×64 here) is KB-sized at ANY corpus size, so — as MLlib's PCA
    * does — the 8 power rounds then run driver-local: a 64×64 matvec
    * per round, independent of N, instead of 8 chained cluster rounds
    * that would each re-execute the Gramian lineage. For d in the
    * thousands you'd switch to randomized range sketching; the scan
    * reads only the `embedding` column ([[pcaScan]], PlanSpec-pinned).
    *
    * Cross-engine determinism, the PageRank recipe: float products are
    * exactly representable as doubles and sum as DECIMAL(27,18);
    * centered covariance quantizes to 12 dp; each round's matvec
    * re-quantizes to 12 dp and the normalized vector to 9 dp, so both
    * engines walk bit-identical iterates from the exact v₀ = 1/√64 =
    * 0.125. The driver-local rounds replicate the engine arithmetic
    * exactly: decimal(27,18) HALF_UP partial sums ([[decSum18]] is
    * the Cast-to-decimal twin) and the floor-based [[roundHalfUp]]
    * on the same doubles. */
  private def embeddingPca(s: SparkSession, d: String): DataFrame =
    pcaTopComponent(Tables.embeddings(s, d))

  private[graft] def pcaTopComponent(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val (n, sums, prods) = pcaGramian(emb)
    // degenerate corpus (empty, or n=1: zero covariance dof) → empty
    // report rather than a divide-by-zero NaN vector
    if (n < 2) return Seq.empty[(Long, Double, Double)]
      .toDF("pos", "mu", "loading")
    val d = sums.length
    val mu = Array.tabulate(d)(i => rhuLocal(sums(i).doubleValue / n, 9))
    val c = Array.tabulate(d, d) { (i, j) =>
      val sp = (if (j <= i) prods(i)(j) else prods(j)(i)).doubleValue
      rhuLocal((sp - n.toDouble * mu(i) * mu(j)) / (n - 1).toDouble, 12)
    }
    var m = Array.fill(d)(0.125)
    for (_ <- 1 to PcaRounds) {
      val u = Array.tabulate(d)(i =>
        rhuLocal(decSum18((0 until d).map(j => c(i)(j) * m(j))), 12))
      val nrm = math.sqrt(decSum18(u.toSeq.map(x => x * x)))
      m = u.map(x => rhuLocal(x / nrm, 9))
    }
    (0 until d).map(i => (i.toLong, mu(i), m(i)))
      .toDF("pos", "mu", "loading").orderBy($"pos")
  }

  /** The pruned scan the Gramian pass runs over (PlanSpec pins that
    * only `embedding` reaches the parquet reader). */
  private[graft] def pcaScan(emb: DataFrame): DataFrame =
    emb.select(emb("embedding"))

  /** One pass, zero shuffles: per-partition upper-triangle running
    * sums (Σxᵢ and Σxᵢxⱼ, j ≤ i, as exact DECIMAL(27,18) partials —
    * [[decSum18]]'s cast semantics applied per term), one d×d partial
    * emitted per partition, exact decimal reduce to the driver.
    * Addition order cannot matter: decimal partials are exact. */
  private[graft] def pcaGramian(emb: DataFrame)
      : (Long, Array[java.math.BigDecimal],
         Array[Array[java.math.BigDecimal]]) = {
    import java.math.{BigDecimal => BD, RoundingMode}
    def dec18(x: Double): BD =
      BD.valueOf(x).setScale(18, RoundingMode.HALF_UP)
    // spread the compute-heavy accumulation across the cluster: a
    // small parquet file maps to ONE scan partition, which would run
    // the d²-per-row loop single-threaded; the round-robin exchange
    // moves each row once and decimal partials are order-free, so the
    // result is partitioning-invariant
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val parts = pcaScan(emb).repartition(par).rdd.mapPartitions { it =>
      var n = 0L
      var s: Array[BD] = null
      var sp: Array[Array[BD]] = null
      it.foreach { r =>
        if (!r.isNullAt(0)) {
          val a = r.getSeq[Float](0)
          val d = a.length
          if (s == null) {
            s = Array.fill(d)(BD.ZERO)
            sp = Array.tabulate(d)(i => Array.fill(i + 1)(BD.ZERO))
          }
          val x = new Array[Double](d)
          var i = 0
          while (i < d) { x(i) = a(i).toDouble; i += 1 }
          i = 0
          while (i < d) {
            s(i) = s(i).add(dec18(x(i)))
            val row = sp(i)
            var j = 0
            while (j <= i) { row(j) = row(j).add(dec18(x(i) * x(j))); j += 1 }
            i += 1
          }
          n += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, s, sp))
    }
    // one (n, sums, prods) partial per non-empty partition — KB-sized;
    // collect + local reduce also covers the all-empty corpus (RDD
    // reduce throws on zero partials)
    val partials = parts.collect()
    if (partials.isEmpty)
      (0L, Array.empty[java.math.BigDecimal],
        Array.empty[Array[java.math.BigDecimal]])
    else partials.reduce { (a, b) =>
      val d = a._2.length
      (a._1 + b._1,
        Array.tabulate(d)(i => a._2(i).add(b._2(i))),
        Array.tabulate(d)(i =>
          Array.tabulate(i + 1)(j => a._3(i)(j).add(b._3(i)(j)))))
    }
  }

  /** Driver-local twin of `sum(x.cast(DecimalType(27,18)))`: Spark's
    * double→decimal Cast goes through `Double.toString` then rounds
    * HALF_UP to scale 18; decimal addition is exact. */
  private def decSum18(xs: Seq[Double]): Double = xs
    .map(x => java.math.BigDecimal.valueOf(x)
      .setScale(18, java.math.RoundingMode.HALF_UP))
    .reduce(_.add(_)).doubleValue

  /** Driver-local twin of [[roundHalfUp]] (floor(x·10ⁿ + 0.5)/10ⁿ on
    * doubles — safe here: |x·10ⁿ| ≪ 2⁵³ for quantized iterates). */
  private def rhuLocal(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.floor(x * p + 0.5) / p
  }

  /** One oracle power round: `v{k}` from `v{k-1}`. */
  private def pcaRoundSql(k: Int): String =
    s"""u$k AS (
       |  SELECT cov.i, ${roundHalfUpSql(
        s"CAST(SUM(CAST(cov.c * v${k - 1}.m AS DECIMAL(27,18))) AS DOUBLE)",
        12)} AS u
       |  FROM cov JOIN v${k - 1} ON v${k - 1}.j = cov.j
       |  GROUP BY cov.i
       |),
       |n$k AS (
       |  SELECT sqrt(CAST(SUM(CAST(u * u AS DECIMAL(27,18))) AS DOUBLE)) AS nrm
       |  FROM u$k
       |),
       |v$k AS (
       |  SELECT i AS j, ${roundHalfUpSql("u / nrm", 9)} AS m
       |  FROM u$k CROSS JOIN n$k
       |)""".stripMargin

  private def pcaOracle: String = {
    val rounds = (1 to PcaRounds).map(pcaRoundSql).mkString(",\n")
    s"""WITH x AS (
       |  SELECT vec_id, j AS i, CAST(embedding[j + 1] AS DOUBLE) AS xi
       |  FROM embeddings CROSS JOIN range(0, $EmbDims) t(j)
       |),
       |mu AS (
       |  SELECT i, ${roundHalfUpSql(
        "CAST(SUM(CAST(xi AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*)", 9)} AS mu
       |  FROM x GROUP BY i
       |),
       |raw AS (
       |  SELECT a.i AS i, b.i AS j,
       |    CAST(SUM(CAST(a.xi * b.xi AS DECIMAL(27,18))) AS DOUBLE) AS sp,
       |    COUNT(*) AS n
       |  FROM x a JOIN x b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i
       |),
       |cov AS (
       |  SELECT raw.i, raw.j, ${roundHalfUpSql(
        "(raw.sp - raw.n * ma.mu * mb.mu) / (raw.n - 1)", 12)} AS c
       |  FROM raw JOIN mu ma ON ma.i = raw.i JOIN mu mb ON mb.i = raw.j
       |),
       |v0 AS (SELECT i AS j, CAST(0.125 AS DOUBLE) AS m FROM mu),
       |$rounds
       |SELECT mu.i AS pos, mu.mu, v$PcaRounds.m AS loading
       |FROM mu JOIN v$PcaRounds ON v$PcaRounds.j = mu.i
       |ORDER BY pos""".stripMargin
  }

  /** Declarative data-quality constraint suite (the Deequ/
    * great-expectations shape): domain, range, not-null, positivity,
    * and primary-key-uniqueness checks over lineitem, evaluated in ONE
    * pass and reported long-form as (constraint, n_rows, n_failed,
    * pass_rate) — the gate a 100 TB ingest runs before publishing a
    * partition.
    *
    * Scale: every row-level check folds into the same map-side
    * combined global aggregate (7 counters), so the suite costs one
    * scan regardless of how many constraints it carries; only the
    * pk-uniqueness check adds data movement (the exact distinct on the
    * composite key — the one constraint that genuinely needs a
    * shuffle), and its key rides as one long, not a struct. The final
    * unpivot is 7 driver-side rows. */
  private def dqReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def failed(bad: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(bad, 1L).otherwise(0L))
    val a = Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"),
      failed(!$"l_quantity".between(1.0, 50.0)).as("f_qty"),
      failed(!$"l_discount".between(0.0, 0.1)).as("f_disc"),
      failed($"l_shipdate".isNull).as("f_ship"),
      failed(!($"l_extendedprice" > 0.0)).as("f_price"),
      failed(!$"l_returnflag".isin("A", "N", "R")).as("f_flag"),
      failed(!$"l_tax".between(0.0, 0.08)).as("f_tax"),
      (count(lit(1)) -
        count_distinct($"l_orderkey" * 10 + $"l_linenumber")).as("f_pk"))
    a.select($"n", expr(
        """stack(7,
          |  'discount_range', f_disc,
          |  'pk_unique', f_pk,
          |  'price_positive', f_price,
          |  'quantity_range', f_qty,
          |  'returnflag_domain', f_flag,
          |  'shipdate_not_null', f_ship,
          |  'tax_range', f_tax) AS (check_name, n_failed)""".stripMargin))
      .select($"check_name", $"n".as("n_rows"), $"n_failed",
        roundHalfUp(lit(1.0) - lit(1.0) * $"n_failed" / $"n", 6)
          .as("pass_rate"))
      .orderBy($"check_name")
  }

  private def dqOracle: String = {
    val arms = Seq(
      "discount_range" -> "f_disc", "pk_unique" -> "f_pk",
      "price_positive" -> "f_price", "quantity_range" -> "f_qty",
      "returnflag_domain" -> "f_flag", "shipdate_not_null" -> "f_ship",
      "tax_range" -> "f_tax")
      .map { case (c, f) =>
        s"SELECT '$c' AS check_name, n, CAST($f AS BIGINT) AS n_failed FROM a" }
      .mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n,
       |    SUM(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
       |      THEN 1 ELSE 0 END) AS f_qty,
       |    SUM(CASE WHEN NOT (l_discount BETWEEN 0.0 AND CAST(0.1 AS DOUBLE))
       |      THEN 1 ELSE 0 END) AS f_disc,
       |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS f_ship,
       |    SUM(CASE WHEN NOT (l_extendedprice > 0.0)
       |      THEN 1 ELSE 0 END) AS f_price,
       |    SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
       |      THEN 1 ELSE 0 END) AS f_flag,
       |    SUM(CASE WHEN NOT (l_tax BETWEEN 0.0 AND CAST(0.08 AS DOUBLE))
       |      THEN 1 ELSE 0 END) AS f_tax,
       |    COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber) AS f_pk
       |  FROM lineitem
       |)
       |SELECT check_name, n AS n_rows, n_failed,
       |  ${roundHalfUpSql("1.0 - 1.0 * n_failed / n", 6)} AS pass_rate
       |FROM ($arms)
       |ORDER BY check_name""".stripMargin
  }

  /** Activity-concentration diagnostic: exact Gini coefficient and
    * top-1 %/top-10 % event shares of the per-user event distribution —
    * the "is this workload hub-dominated" probe that decides whether
    * downstream per-user jobs need salting, and the drift alarm when a
    * bot cohort shows up.
    *
    * Scale-honest exactness: after the one per-user count shuffle, the
    * distribution collapses to a COUNT HISTOGRAM ((n_events,
    * users_with_n) — bounded by distinct activity levels, not users),
    * and both the Gini (grouped-data form: G = 1 − Σ fᵢ·(Sᵢ₋₁+Sᵢ)/S)
    * and the top-k% shares (cumulative user counts walked from the
    * heaviest bucket, boundary bucket admitted pro-rata in WHOLE
    * users) resolve on that histogram with integer arithmetic — no
    * per-user sort anywhere. Ratios quantize to 6 dp at the end. */
  private def eventsGini(s: SparkSession, d: String) =
    giniOf(Tables.events(s, d))

  private[graft] def giniOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val perUser = events
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    val hist = perUser.groupBy($"n").agg(count(lit(1)).as("users"))
      .cache() // metadata-sized; five consumers below walk it
    val wAsc = Window.orderBy($"n".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy($"n".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ≤ |distinct activity levels| rows: global windows over the
    // HISTOGRAM are metadata-sized by construction
    val walked = hist
      .withColumn("cum_users_asc", sum($"users").over(wAsc))
      .withColumn("cum_ev_asc", sum($"users" * $"n").over(wAsc))
      .withColumn("cum_users_desc", sum($"users").over(wDesc))
      .withColumn("cum_ev_desc", sum($"users" * $"n").over(wDesc))
    val tot = walked.agg(
      max($"cum_users_asc").as("nu"), max($"cum_ev_asc").as("ne")).cache()
    def topShare(pct: Int, name: String) = {
      // k heaviest users, k = ceil(nu·pct/100); boundary bucket
      // contributes (k − users above it) WHOLE users at n events each
      walked.crossJoin(broadcast(tot))
        .withColumn("k", expr(s"CAST(ceil(nu * $pct / 100.0) AS BIGINT)"))
        .filter($"cum_users_desc" - $"users" < $"k")
        .select(sum(
          least($"users", $"k" - ($"cum_users_desc" - $"users")) * $"n")
          .as(name))
    }
    // Σ users·(S_{i-1}+S_i) is an exact INTEGER — no float summation
    // anywhere; gini needs exactly one double division at the end
    // (num < nu·ne ≤ 2⁵³ at any realistic scale; past that, DECIMAL)
    val gini = walked
      .select(sum($"users" * ($"cum_ev_asc" - $"users" * $"n" + $"cum_ev_asc"))
        .as("num"))
    hist.agg(sum($"users").as("n_users"),
        sum($"users" * $"n").as("n_events"))
      .crossJoin(broadcast(gini))
      .crossJoin(broadcast(topShare(1, "top1_ev")))
      .crossJoin(broadcast(topShare(10, "top10_ev")))
      .select($"n_users", $"n_events",
        roundHalfUp(lit(1.0) -
          $"num".cast("double") / ($"n_users" * $"n_events"), 6).as("gini"),
        roundHalfUp($"top1_ev" / $"n_events", 6).as("top1pct_share"),
        roundHalfUp($"top10_ev" / $"n_events", 6).as("top10pct_share"))
  }

  private def giniOracle: String =
    s"""WITH per_user AS (
       |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
       |),
       |hist AS (SELECT n, COUNT(*) AS users FROM per_user GROUP BY n),
       |walked AS (
       |  SELECT n, users,
       |    SUM(users) OVER (ORDER BY n ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_users_asc,
       |    SUM(users * n) OVER (ORDER BY n ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ev_asc,
       |    SUM(users) OVER (ORDER BY n DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_users_desc
       |  FROM hist
       |),
       |tot AS (
       |  SELECT CAST(MAX(cum_users_asc) AS BIGINT) AS nu,
       |    CAST(MAX(cum_ev_asc) AS BIGINT) AS ne FROM walked
       |),
       |gini AS (
       |  SELECT SUM(users * (cum_ev_asc - users * n + cum_ev_asc)) AS num
       |  FROM walked
       |),
       |top1 AS (
       |  SELECT SUM(LEAST(users,
       |      CAST(ceil(t.nu * 1 / 100.0) AS BIGINT)
       |        - (cum_users_desc - users)) * n) AS top1_ev
       |  FROM walked CROSS JOIN tot t
       |  WHERE cum_users_desc - users < CAST(ceil(t.nu * 1 / 100.0) AS BIGINT)
       |),
       |top10 AS (
       |  SELECT SUM(LEAST(users,
       |      CAST(ceil(t.nu * 10 / 100.0) AS BIGINT)
       |        - (cum_users_desc - users)) * n) AS top10_ev
       |  FROM walked CROSS JOIN tot t
       |  WHERE cum_users_desc - users < CAST(ceil(t.nu * 10 / 100.0) AS BIGINT)
       |)
       |SELECT t.nu AS n_users, t.ne AS n_events,
       |  ${roundHalfUpSql(
      "1.0 - CAST(g.num AS DOUBLE) / CAST(t.nu * t.ne AS DOUBLE)", 6)} AS gini,
       |  ${roundHalfUpSql("1.0 * t1.top1_ev / t.ne", 6)} AS top1pct_share,
       |  ${roundHalfUpSql("1.0 * t10.top10_ev / t.ne", 6)} AS top10pct_share
       |FROM tot t CROSS JOIN gini g CROSS JOIN top1 t1 CROSS JOIN top10 t10""".stripMargin

  val defs: Seq[OpDef] = Seq(
    OpDef("events_gini", eventsGini _, giniOracle),
    OpDef("dq_report", dqReport _, dqOracle),
    OpDef("diag_lateness", diagLateness _, latenessOracle),
    OpDef("embedding_pca", embeddingPca _, pcaOracle),
    OpDef("diag_embedding_drift", diagEmbeddingDrift _, driftOracle),
    OpDef("diag_skew", diagSkew _,
      Seq(
        keyStatsSql("lineitem", "l_suppkey"),
        keyStatsSql("lineitem", "l_partkey"),
        keyStatsSql("orders", "o_custkey"),
        keyStatsSql("events", "user_id"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_key"))
  )
}
