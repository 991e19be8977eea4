package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering and ML-observability operators: the stages that
  * sit between a curated corpus/event log and a trained (or monitored)
  * model. Everything follows the engine's determinism discipline —
  * integer micro/cents units for all ratio arithmetic, round-6 floats
  * only where a transcendental (ln, sqrt) is inherent — so every
  * operator has an exact DuckDB-oracle rendering.
  *
  * Reference surface: the reference ships the generic combinators
  * these compose from (`group_by`/`a_group_by`/`join`,
  * `/root/reference/dampr/dampr.py:331-420`) but no ML-prep layer;
  * these are the upgrade operators a training-data pipeline needs at
  * 100 TB, same spirit as the dedup/ANN families.
  */
object Features {

  /** Max concurrent intervals per group via the sweep-line (+1/-1)
    * trick: each row becomes a start point (+1) and an end point (-1)
    * `durSec` later, and the running sum ordered by (time, delta) is
    * the instantaneous concurrency. `delta` ascending at equal time
    * processes ends before starts — half-open [t, t+dur) semantics, so
    * back-to-back intervals never double-count.
    *
    * Scale: the sweep partitions by (group, DAY), not by group alone —
    * a group's whole history in one sort partition was measured at
    * 31.8 s for 4M-point groups at the x100 soak tier and only gets
    * worse. Each day sweeps locally; the day-boundary correction is
    * exact and cheap: a day's opening concurrency is the running sum
    * of all previous days' delta totals (one per-(group,day) window
    * over day aggregates — hundreds of rows per group, never points),
    * and `max(opening_carry + within-day max)` is the true maximum
    * because the carry is constant inside a day.
    */
  def maxConcurrency(df: DataFrame, part: Column, ts: Column, durSec: Int): DataFrame = {
    val base = df.select(part.as("grp"), ts.as("t0"))
    val points = base
      .select(col("grp"), col("t0").as("t"), lit(1).as("delta"))
      .unionAll(base.select(col("grp"),
        (col("t0") + expr(s"INTERVAL $durSec SECONDS")).as("t"), lit(-1).as("delta")))
      .withColumn("day", col("t").cast("date"))
    val wd = Window.partitionBy(col("grp"), col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = points
      .withColumn("run", sum(col("delta")).over(wd))
      .groupBy(col("grp"), col("day"))
      .agg(max(col("run")).as("day_max"), sum(col("delta")).as("day_sum"),
        count(lit(1)).as("n_pts"))
    val wc = Window.partitionBy(col("grp")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("carry", coalesce(sum(col("day_sum")).over(wc), lit(0L)))
      .groupBy(col("grp"))
      .agg((sum(col("n_pts")) / 2).cast("long").as("n_intervals"),
        max(col("carry") + col("day_max")).cast("int").as("max_conc"))
  }

  /** Population Stability Index between a reference and a current
    * sample of an integer-unit metric: 10 equal-width buckets bounded
    * by the REFERENCE min/max (out-of-range current values clamp to
    * the edge buckets — drift beyond the trained range lands visibly
    * in bucket 0/9), Laplace-smoothed proportions so empty buckets
    * never divide by zero, per-bucket contribution
    * `(p - q) * ln(p / q)` rounded to 6 decimals (ln is the one
    * inherent float; counts and bucketing stay exact integers).
    *
    * Both inputs are scanned once into 10-row aggregates; the PSI
    * arithmetic happens on the bucket spine (driver-free, broadcast
    * joins). The corpus-size cost is the two scans — nothing else
    * grows with data.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, vm: Column, buckets: Int = 10): DataFrame = {
    val sp = ref.sparkSession
    val bounds = ref.select(vm.as("vm")).agg(min(col("vm")).as("mn"), max(col("vm")).as("mx"))
    // clamp first: Spark `div` truncates toward zero while DuckDB `//`
    // floors, but every below-range quotient is <= 0 in both and the
    // greatest(0, _) clamp erases the difference. The clamp runs in
    // LONG and the int cast comes after — with a degenerate reference
    // range (mx == mn, denominator 1) a current value > ~2^31 micro
    // units above mn would wrap Int negative if cast first, landing in
    // bucket 0 instead of 9 and inverting the drift signal (and DuckDB
    // would error on the same overflowing CAST, so the engines would
    // diverge instead of agreeing).
    def side(df: DataFrame, name: String): DataFrame =
      df.select(vm.as("vm")).crossJoin(broadcast(bounds))
        .select(greatest(lit(0L), least(lit((buckets - 1).toLong),
          expr(s"((vm - mn) * $buckets) div (mx - mn + 1)"))).cast("int").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(name))
    val spine = sp.range(buckets).select(col("id").cast("int").as("bucket"))
    val joined = spine
      .join(side(ref, "ref_n"), Seq("bucket"), "left")
      .join(side(cur, "cur_n"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(sum(col("ref_n")).as("rt"), sum(col("cur_n")).as("ct"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(
          ((col("ref_n") + 1) / (col("rt") + buckets) - (col("cur_n") + 1) / (col("ct") + buckets)) *
            log(((col("ref_n") + 1) / (col("rt") + buckets)) / ((col("cur_n") + 1) / (col("ct") + buckets))),
          6).as("psi_r6"))
      .orderBy(col("bucket"))
  }

  /** Smoothed target (mean) encoding of a categorical key: the encoded
    * value is `(sum + prior * m) / (n + m)` in exact integer micro
    * units, where `prior` is the global mean (itself an integer floor)
    * and `m` the smoothing pseudo-count — rare categories shrink
    * toward the prior instead of memorizing noise. One grouped
    * aggregate plus a broadcast of the 1-row global; nothing quadratic,
    * nothing driver-side.
    */
  def targetEncode(df: DataFrame, key: Column, vm: Column, m: Int): DataFrame = {
    val per = df.select(key.as("key"), vm.as("vm"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_micro"))
    val global = per.agg(sum(col("sum_micro")).as("ts"), sum(col("n")).as("tn"))
    per.crossJoin(broadcast(global))
      .select(col("key"), col("n"), col("sum_micro"),
        expr(s"(sum_micro + (ts div tn) * $m) div (n + $m)").as("enc_micro"))
  }

  /** The hashing trick: every token routes to one of `nBuckets`
    * feature buckets by the engine's shared md5-derived hash (so the
    * bucket assignment is reproducible across engines, languages and
    * reruns — the property that makes hashed features usable as a
    * stable contract). Emits per-bucket load stats: total tokens,
    * distinct terms (collision load) and distinct docs. Map-side
    * hash + one aggregation; the two count-distincts expand the
    * aggregate 2×, the standard cost of auditing collision load.
    */
  def featureHashStats(df: DataFrame, id: Column, text: Column, nBuckets: Int): DataFrame = {
    val toks = graft.functions.Tokenize.exploded(df, id.as("id"), text)
    toks
      .select(col("id"),
        pmod(graft.plans.Md5Prefix32.md5prefix32(concat(lit("fh_"), col("token"))),
          lit(nBuckets.toLong)).cast("int").as("bucket"),
        col("token"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("token")).as("n_terms"),
        countDistinct(col("id")).as("n_docs"))
  }

  /** Fail fast when a distinct-value frame is large enough to make the
    * unpartitioned rank/CDF window a one-task sort. [[aucExact]] and
    * [[ksTest]] contractually window over DISTINCT scores/values —
    * bounded by metric cardinality, not corpus size — which is fine
    * for quantized model scores (the stated contract) but silently
    * degenerates to a single-task corpus sort if a caller hands them a
    * high-cardinality raw metric. Same refusal posture as
    * [[Dedup.requireBoundedBlocks]]: one count over the (caller-cached)
    * distinct frame before the window is planned — callers register
    * `g` in [[graft.GraftCache]] first, so the guard's action
    * MATERIALIZES the corpus aggregate the window then reuses, rather
    * than running it twice — a clear error
    * pointing at pre-quantization, and a session-conf escape hatch
    * (`graft.window.maxDistinct`, default 2,000,000 — a 2M-row
    * single-task sort is sub-second; past that the task is the job).
    */
  private[graft] def requireBoundedDistinct(g: DataFrame, what: String): Unit = {
    val spark = g.sparkSession
    val key = "graft.window.maxDistinct"
    val limit = spark.conf.getOption(key).map { raw =>
      val n = try raw.trim.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$key must be a positive integer, got '$raw'")
      }
      if (n <= 0) throw new IllegalArgumentException(s"$key must be a positive integer, got '$raw'")
      n
    }.getOrElse(2000000L)
    val n = g.count()
    if (n > limit) throw new IllegalArgumentException(
      s"$what carries $n distinct values > $key=$limit: the unpartitioned " +
        "rank/CDF window would sort them all in ONE task. Pre-quantize the " +
        "metric (e.g. integer units div a bucket width) so cardinality is " +
        s"bounded, or raise $key.")
  }

  /** Exact ROC AUC of an integer score against a boolean label via the
    * tie-aware rank-sum (Mann-Whitney U) identity, entirely in integer
    * arithmetic: group rows by distinct score (one corpus-sized
    * aggregate), then on the DISTINCT-SCORE frame — bounded by score
    * cardinality, not corpus size — compute doubled tie-averaged ranks
    * `2*cum_below + n_s + 1`, so `U2 = 2*U` stays integral under ties.
    * `auc_micro = U2 * 1e6 / (2 * n_pos * n_neg)` (floor).
    *
    * The unpartitioned window runs over distinct scores only — for a
    * quantized model score (the practical case) that is thousands of
    * rows regardless of corpus size.
    */
  def aucExact(df: DataFrame, label: Column, score: Column): DataFrame = {
    // registered BEFORE the guard count so the corpus scan+aggregate
    // materializes once and the window pass reads the cached frame —
    // an unpersisted g would run the dominant corpus aggregate twice
    val g = graft.GraftCache.registered(
      df.select(score.cast("long").as("s"), label.cast("int").cast("long").as("y"))
        .groupBy(col("s")).agg(count(lit(1)).as("n"), sum(col("y")).as("p")))
    requireBoundedDistinct(g, "aucExact's distinct-score frame")
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p") * (col("cum") * 2 + col("n") + 1)).as("r2"),
        sum(col("p")).as("n_pos"), sum(col("n") - col("p")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1)).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("(u2 * 1000000) div (2 * n_pos * n_neg)").as("auc_micro"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic over an integer
    * metric, entirely in integer arithmetic: group both samples by
    * distinct value (corpus-sized aggregates), then on the
    * distinct-value frame the scaled CDF gap `|cumA*nB - cumB*nA|` is
    * an integer whose max is exact — `ks_micro = D * 1e6 / (nA*nB)`.
    * The complement to [[psiDrift]]: PSI reads bucketed proportion
    * shift, KS reads the worst-point CDF gap with no bucketing choice.
    * The unpartitioned window runs over distinct metric values only.
    */
  def ksTest(a: DataFrame, b: DataFrame, vm: Column): DataFrame = {
    val ga = a.select(vm.as("v")).groupBy(col("v")).agg(count(lit(1)).as("ca"))
    val gb = b.select(vm.as("v")).groupBy(col("v")).agg(count(lit(1)).as("cb"))
    // registered BEFORE the guard count (same reason as aucExact): the
    // guard, the totals aggregate, and the CDF window all read one
    // materialization of the corpus-sized grouping instead of three
    val g = graft.GraftCache.registered(ga.join(gb, Seq("v"), "full")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))
    requireBoundedDistinct(g, "ksTest's distinct-value frame")
    val totals = broadcast(g.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b")))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.select(sum(col("ca")).over(w).as("cuma"), sum(col("cb")).over(w).as("cumb"))
      .crossJoin(totals)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a"))).as("d_scaled"))
      // the D ratio divides two exact integers that pass ~2e15 at the
      // x1000 tier — an integer micro rescale overflows 64 bits there
      // (measured), so the one division is a round-6 double
      .select(col("n_a"), col("n_b"), col("d_scaled"),
        round(col("d_scaled") / (col("n_a") * col("n_b")), 6).as("ks_r6"))
  }

  /** Deterministic class balancing: downsample every label class to
    * the size of the SMALLEST class, choosing survivors by the
    * engine-shared md5 rank (reproducible across engines and reruns —
    * no RNG state). One window rank per class + a broadcast of the
    * 1-row minimum; the output is exactly `n_labels * min_count` rows.
    */
  def balanceClasses(df: DataFrame, label: Column, id: Column): DataFrame = {
    val tagged = df.withColumn("_lbl", label)
    val minc = broadcast(tagged.groupBy(col("_lbl")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("min_n")))
    tagged
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_lbl"))
          .orderBy(md5(concat(lit("bal_"), id.cast("string"))), id)))
      .crossJoin(minc)
      .filter(col("_rn") <= col("min_n"))
      .drop("_rn", "min_n", "_lbl")
  }

  /** Per-key OLS slope of y over x in exact integer micro-units:
    * `slope_micro = 1e6 * (n*Σxy - Σx*Σy) div (n*Σx² - (Σx)²)` — one
    * grouped aggregate, integer throughout (trend detection over
    * daily series without a float in sight). Keys with a single x
    * value (zero variance) return null.
    */
  def slopePerKey(df: DataFrame, key: Column, x: Column, y: Column): DataFrame =
    df.select(key.as("key"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("key"), col("n"),
        when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0,
          expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"))
          .as("slope_micro"))

  /** Kaplan-Meier survival curve over integer event times with right
    * censoring: `subjects` has one row per subject with `t` (event or
    * censor time) and `ev` (1 = event, 0 = censored). Grouped by
    * distinct time (corpus-sized aggregate), then the at-risk count
    * and the cumulative product both ride one ordered window over the
    * DISTINCT-TIME frame. The product is the one inherent float,
    * computed as `exp(sum(ln(1 - d/n)))` in deterministic time order
    * and rounded to 6 decimals. Rows where no event occurred (pure
    * censoring times) are folded into the risk set but not emitted —
    * standard KM presentation.
    */
  def kaplanMeier(subjects: DataFrame, t: Column, ev: Column): DataFrame = {
    // the ordered window below runs over the distinct-time frame —
    // bounded only if the caller's time granularity is coarse (days,
    // not epoch-seconds). Same discipline as aucExact/ksTest: refuse
    // loudly instead of planning a corpus-sized single-task window,
    // and register BEFORE the guard count so the corpus scan+aggregate
    // materializes once (unpersisted, the guard doubled the q193
    // x1000 rung: 8.6 -> 20.0 s — measured, then fixed).
    val g = graft.GraftCache.registered(
      subjects.select(t.cast("long").as("t"), ev.cast("int").as("ev"))
        .groupBy(col("t"))
        .agg(sum(col("ev")).cast("long").as("d"),
          sum(lit(1) - col("ev")).cast("long").as("c")))
    requireBoundedDistinct(g, "kaplanMeier's distinct-time frame")
    val total = broadcast(g.agg(sum(col("d") + col("c")).as("n_total")))
    val w = Window.orderBy(col("t"))
    val left = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    // a time where EVERYONE at risk has the event makes its factor 0:
    // ln is undefined there (and Spark's log would null it out, which a
    // windowed sum silently skips — worse than an error). Sum ln over
    // the positive factors only, and once any zero factor has occurred
    // in the prefix, the curve IS 0 from that point on.
    g.crossJoin(total)
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("d") + col("c")).over(left), lit(0L)))
      .withColumn("_hit0", max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(w))
      .withColumn("km_r6",
        when(col("_hit0") === 1, lit(0.0)).otherwise(
          round(exp(sum(when(col("d") < col("n_risk"),
            log(lit(1.0) - col("d") / col("n_risk"))).otherwise(lit(0.0))).over(w)), 6)))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("km_r6"))
      .orderBy(col("t"))
  }

  /** Point-in-time (feature-store) join: for every label row, carry
    * the value columns of the LATEST feature row at or before the
    * label's timestamp within the same key — `strict = true` (the
    * training-set default) takes strictly-before only, so a label can
    * never see features derived from its own instant: the
    * leakage-free-training guarantee a feature store exists to
    * provide.
    *
    * Same shape as [[AsOf.asofJoin]], generalized to carry N typed
    * value columns and every label column: tag both sides, union, and
    * `last(ignoreNulls)` each value column over one
    * (key)-partitioned (ts, side, seq) window. ONE hash shuffle on
    * the keys + a per-partition sort — never the O(labels × features)
    * candidate set of a range join. `seq` breaks feature ties at
    * equal timestamps (latest wins), keeping the carried row — and
    * the oracle hash — deterministic.
    */
  def pitJoin(labels: DataFrame, features: DataFrame, by: Seq[String],
      ts: String, seq: String, valueCols: Seq[String],
      strict: Boolean = true): DataFrame = {
    val labelExtra = labels.columns.toSeq.filterNot(c => by.contains(c) || c == ts)
    // strict: features sort AFTER labels at equal ts (excluded by the
    // unbounded..current frame); inclusive: before.
    val fTag = if (strict) 1 else -1
    val l = labels.select(
      (by :+ ts).map(col) ++ Seq(lit(0L).as("_seq"), lit(0).as("_tag")) ++
        labelExtra.map(col) ++
        valueCols.map(c => lit(null).cast(features.schema(c).dataType).as(c)): _*)
    val f = features.select(
      (by :+ ts).map(col) ++ Seq(col(seq).cast("long").as("_seq"), lit(fTag).as("_tag")) ++
        labelExtra.map(c => lit(null).cast(labels.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(ts), col("_tag"), col("_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(l.unionByName(f)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      .filter(col("_tag") === 0)
      .select((by :+ ts).map(col) ++ labelExtra.map(col) ++ valueCols.map(col): _*)
  }

  /** Welch's two-sample z over exact integer-cents sums: group counts
    * and Σ/Σ² accumulate as BIGINTs (cents keep Σ² inside 2^63 for
    * realistic magnitudes; micro units would overflow), then the mean
    * difference and z-statistic are the only floats, rounded to 6
    * decimals. One conditional aggregate — a single corpus pass, no
    * shuffle beyond the 1-row result.
    */
  def welchAB(df: DataFrame, isA: Column, cents: Column): DataFrame = {
    val a = df.select(isA.cast("int").as("g"), cents.cast("long").as("c"))
    a.agg(
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("g") =!= 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g") === 1, col("c")).otherwise(0L)).as("sum_a_cents"),
        sum(when(col("g") =!= 1, col("c")).otherwise(0L)).as("sum_b_cents"),
        sum(when(col("g") === 1, col("c") * col("c")).otherwise(0L)).as("qa"),
        sum(when(col("g") =!= 1, col("c") * col("c")).otherwise(0L)).as("qb"))
      .select(col("n_a"), col("n_b"), col("sum_a_cents"), col("sum_b_cents"),
        round(col("sum_a_cents") / col("n_a") - col("sum_b_cents") / col("n_b"), 6)
          .as("dmean_cents_r6"),
        // s² must square as DOUBLE: the exact long product overflows
        // once Σcents passes ~3e9 (hit at the x100 soak tier). Both
        // engines then round the same exact operands once — DuckDB
        // squares in HUGEINT and converts, IEEE multiply of exact
        // doubles lands on the identical bits.
        round(
          (col("sum_a_cents") / col("n_a") - col("sum_b_cents") / col("n_b")) /
            sqrt(
              (col("qa") - col("sum_a_cents").cast("double") * col("sum_a_cents") / col("n_a")) / (col("n_a") - 1) / col("n_a") +
              (col("qb") - col("sum_b_cents").cast("double") * col("sum_b_cents") / col("n_b")) / (col("n_b") - 1) / col("n_b")),
          6).as("z_r6"))
  }

  /** Deterministic Poisson bootstrap CI of a mean — the at-scale
    * bootstrap: instead of drawing n rows with replacement B times
    * (unshardable), each row gets an independent Poisson(1) weight
    * per resample, which converges to the same bootstrap distribution
    * and is embarrassingly parallel. The "RNG" is the engine-shared
    * md5 hash mapped through the micro-rounded Poisson(1) CDF
    * (constants inlined on both engines), so the whole CI is a pure
    * function of the data — reproducible across runs, engines and
    * cluster sizes. CI bounds are nearest-rank percentiles of the B
    * resample means (2.5% / 97.5%).
    *
    * Scale: ONE pass over rows x B (a projected crossJoin with the
    * broadcast B-row spine — no shuffle until the B-key aggregate,
    * whose state is B rows); the rank window runs on the B means
    * only. Weighted sums are exact longs; each mean is one double
    * division of exact integers.
    */
  def bootstrapCI(df: DataFrame, id: Column, cents: Column,
      b: Int = 100): DataFrame = {
    require(b >= 40, s"bootstrapCI: need >= 40 resamples for a 2.5% rank, got $b")
    val spark = df.sparkSession
    val spine = broadcast(spark.range(b).select(col("id").cast("long").as("bi")))
    val u = pmod(graft.plans.Md5Prefix32.md5prefix32(
      concat_ws("_", lit("boot"), col("rid"), col("bi"))), lit(1000000L))
    // micro-rounded cumulative Poisson(1): P(K <= k) for k = 0..8; the
    // tail above 0.999999 collapses to k = 9 (one event in a million)
    val k = when(u < 367879L, 0L).when(u < 735759L, 1L).when(u < 919699L, 2L)
      .when(u < 981012L, 3L).when(u < 996340L, 4L).when(u < 999406L, 5L)
      .when(u < 999917L, 6L).when(u < 999990L, 7L).when(u < 999999L, 8L)
      .otherwise(9L)
    val means = df.select(id.as("rid"), cents.cast("long").as("c"))
      .crossJoin(spine)
      .select(col("bi"), k.as("w"), col("c"))
      .groupBy(col("bi"))
      .agg(sum(col("w")).as("nw"), sum(col("w") * col("c")).as("sw"))
      .select(col("bi"), (col("sw").cast("double") / col("nw")).as("m"))
    val w = Window.orderBy(col("m"), col("bi"))
    val lo = math.ceil(0.025 * b).toLong
    val hi = math.ceil(0.975 * b).toLong
    val ranked = means.withColumn("rn", row_number().over(w))
    ranked.agg(count(lit(1)).as("n_resamples"),
      round(avg(col("m")), 6).as("mean_of_means_r6"),
      round(max(when(col("rn") === lo, col("m"))), 6).as("ci_lo_r6"),
      round(max(when(col("rn") === hi, col("m"))), 6).as("ci_hi_r6"))
  }

  /** Autocorrelation function of a regular series: Pearson r of
    * `(v_t, v_{t+lag})` for every lag in `1..maxLag`, over an
    * already-aggregated `(t, v)` frame (integer time index, integer
    * value units). Gaps are skipped, not imputed: a lag pair exists
    * only when both points do, and each lag reports its own pair
    * count. The autocorrelation fingerprint — weekly seasonality
    * shows as a spike at lag 7 — is the first thing a forecast or
    * anomaly monitor reads off a metric series.
    *
    * Scale: the input is POST-aggregation (days/hours), bounded by
    * the calendar, not the corpus — the heavy reduce happened
    * upstream with map-side combine. The lag spine broadcasts
    * (maxLag rows) and the shifted self-join is one hash join on the
    * offset index. Cross moments (`x·y` of two daily sums) pass 2^63
    * long before the series does, so they accumulate in
    * DECIMAL(38,0) — exact and order-free, the
    * [[Relational.tableChecksum]] precedent — and promote to double
    * only inside the final Pearson products; r arrives round-6.
    */
  def autocorr(series: DataFrame, t: Column, v: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"autocorr: maxLag must be >= 1, got $maxLag")
    val s = graft.GraftCache.registered(
      series.select(t.cast("long").as("t"), v.cast("long").as("v")))
    val lags = broadcast(series.sparkSession.range(1, maxLag + 1).toDF("lag"))
    val pairs = s.crossJoin(lags)
      .select(col("lag"), (col("t") + col("lag")).as("t2"), col("v").as("x"))
      .join(s.select(col("t").as("t2"), col("v").as("y")), Seq("t2"))
    val xd = col("x").cast("decimal(18,0)")
    val yd = col("y").cast("decimal(18,0)")
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(xd * yd).as("sxy"),
        sum(xd * xd).as("sxx"),
        sum(yd * yd).as("syy"))
      .select(col("lag"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("r_r6"))
      .orderBy(col("lag"))
  }
}
