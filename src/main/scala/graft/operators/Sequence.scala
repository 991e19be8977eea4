package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event analytics over an event stream (user journeys): the
  * sequential-funnel and cohort-retention primitives every
  * product/ops pipeline runs next to its windowed aggregates
  * (SURVEY.md §2.5's window family is per-event; these are
  * per-SEQUENCE). The reference has no event surface at all; these
  * compose Spark's keyed aggregates so each stage is one
  * map-side-combined shuffle on the user key.
  */
object Sequence {

  /** Strict sequential funnel: per user, stage `i+1` counts only if an
    * event of its type occurs STRICTLY AFTER the user's earliest
    * completion of stage `i` (the classic ordered-funnel semantics —
    * a purchase before the first view does not convert). Returns one
    * row per stage: `(stage_idx, stage, n_users)`.
    *
    * Shape: one filtered min-aggregate per stage, each joined to the
    * previous stage's per-user frontier — `stages.length` keyed
    * shuffles on the user key, each carrying one row per surviving
    * user (monotonically shrinking). No windows, no per-user event
    * sorting: the frontier join prunes before any ordering work.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], maxGapSec: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val byUser = Seq(col(userCol))
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(byUser: _*).agg(min(col(tsCol)).as("t"))
    var out = frontier.agg(count(lit(1)).cast("int").as("n_users"))
      .select(lit(0).as("stage_idx"), lit(stages.head).as("stage"), col("n_users"))
    for ((s, i) <- stages.tail.zipWithIndex) {
      // windowed variant: the next stage must land within maxGapSec of
      // the frontier instant (strict-from-first semantics — the clock
      // starts at the user's FIRST stage-k completion, the standard
      // product-analytics windowed funnel)
      val gapOk = maxGapSec.fold(lit(true))(g =>
        col(tsCol) <= col("prev_t") + expr(s"INTERVAL $g SECONDS"))
      frontier = events.filter(col(typeCol) === s)
        .join(frontier.select(col(userCol), col("t").as("prev_t")), userCol)
        .filter(col(tsCol) > col("prev_t") && gapOk)
        .groupBy(byUser: _*).agg(min(col(tsCol)).as("t"))
      out = out.union(
        frontier.agg(count(lit(1)).cast("int").as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(s).as("stage"), col("n_users")))
    }
    out
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event (weeks = 7-day buckets from the corpus's global
    * earliest event — data-derived, no calendar config), and each
    * (cohort week, weeks-since-cohort offset) cell counts the
    * cohort's users active in that week. The global anchor rides a
    * broadcast 1-row aggregate; everything else is two keyed
    * aggregates (per-user first event, distinct user-weeks) and one
    * count — all map-side combined, nothing corpus-quadratic.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val anchor = broadcast(events.agg(min(to_date(col(tsCol))).as("t0")))
    val weeks = events.crossJoin(anchor)
      .select(col(userCol),
        expr(s"datediff(to_date($tsCol), t0) div 7").as("week"))
    val firstWeek = weeks.groupBy(col(userCol)).agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(firstWeek, userCol)
      .select(col(userCol), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).cast("int").as("n_users"))
  }

  /** Exponentially time-decayed counts per group — the trending /
    * recency-weighted popularity primitive (what "hot topics" ranks
    * by): each event contributes a weight halved per elapsed
    * half-life. Engine-exact by construction: ages quantize to whole
    * half-lives, weights are integer micro-units `1000000 >> k`
    * (k capped at 20, past which the weight is 0 anyway), and the sum
    * of integers is exact in any order. The anchor is the corpus's
    * latest event date (data-derived and replayable, the q147-cohort
    * dual); one broadcast 1-row cross join + one map-side-combined
    * aggregation — a pure scan shape at any corpus size.
    */
  def decayedCounts(events: DataFrame, groupCol: String, tsCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"decayedCounts: halfLifeDays >= 1, got $halfLifeDays")
    val anchor = broadcast(events.agg(max(to_date(col(tsCol))).as("t1")))
    events.crossJoin(anchor)
      .select(col(groupCol),
        expr(s"least(datediff(t1, to_date($tsCol)) div $halfLifeDays, 20)").as("hl"))
      .select(col(groupCol),
        expr("1000000L div shiftleft(1L, cast(hl as int))").as("w_micro"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("w_micro")).as("decayed_micro"))
  }

  /** Last-touch attribution: for every conversion event, the latest
    * touch event by the same user inside the lookback window
    * (`touch_ts ∈ (conv_ts − windowSec, conv_ts]`), ties broken on
    * the tie column — deterministic, so the attribution table is
    * engine-exact. The batch face of
    * [[graft.streaming.EventStream.purchaseAttribution]].
    *
    * Shape: user-keyed equi join with the window as a residual
    * predicate (co-partitioned by user — never a time-only range
    * join), then one ranking window per conversion. Join fan-out is
    * bounded by touches-per-user-per-window, the analytics-native
    * bound.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, convType: String, touchType: String,
      windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsCol).as("conv_ts"), col(tieCol).as("conv_id"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(tsCol).as("touch_ts"), col(tieCol).as("touch_id"))
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    conv.join(touch, userCol)
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(userCol), col("conv_id"), col("touch_id"),
        (unix_micros(col("conv_ts")) - unix_micros(col("touch_ts")))
          .as("gap_micros"))
  }

  /** Multi-touch position-based (U-shaped) attribution — the credit
    * model [[lastTouchAttribution]] is the degenerate case of: every
    * in-window touch of a conversion gets integer micro credit by
    * position. Contract: 1 touch -> 1e6; 2 -> 500k each; else
    * first/last 400k and each middle `200000 div (n-2)` (the integer
    * remainder is dropped — documented, deterministic, and the sum
    * check is exactly what q-grading replays). Same co-partitioned
    * user-keyed join + per-conversion window as last-touch; fan-out
    * is touches-per-user-per-window.
    */
  def positionAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, convType: String, touchType: String,
      windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsCol).as("conv_ts"), col(tieCol).as("conv_id"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(tsCol).as("touch_ts"), col(tieCol).as("touch_id"))
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts"), col("touch_id"))
    val wn = Window.partitionBy(col("conv_id"))
    conv.join(touch, userCol)
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .withColumn("pos", row_number().over(w))
      .withColumn("n_touches", count(lit(1)).over(wn))
      .withColumn("credit_micro",
        when(col("n_touches") === 1, 1000000L)
          .when(col("n_touches") === 2, 500000L)
          .when(col("pos") === 1 || col("pos") === col("n_touches"), 400000L)
          .otherwise(expr("200000 div (n_touches - 2)")))
      .select(col(userCol), col("conv_id"), col("touch_id"), col("pos"),
        col("n_touches"), col("credit_micro"))
  }

  /** Time-decay attribution: every in-window touch of a conversion is
    * credited `1e6 div 2^(gap div halfLifeSec)` in integer micro —
    * recency-weighted credit with EXACT halving buckets instead of a
    * transcendental decay (`pow`/`exp` are not correctly rounded by
    * IEEE, so a continuous decay would drift across engines; the
    * bucketed halving is bit-stable everywhere and keeps the
    * recency-matters semantics). Same co-partitioned user-keyed join
    * shape as [[lastTouchAttribution]]/[[positionAttribution]].
    */
  def decayAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, convType: String, touchType: String,
      windowSec: Long, halfLifeSec: Long): DataFrame = {
    require(halfLifeSec >= 1 && windowSec / halfLifeSec < 62,
      s"decayAttribution: window/halfLife must stay below 62 halvings " +
        s"(got ${windowSec / halfLifeSec}) — the credit is a long shift")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(tsCol).as("conv_ts"), col(tieCol).as("conv_id"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(tsCol).as("touch_ts"), col(tieCol).as("touch_id"))
    conv.join(touch, userCol)
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .withColumn("gap_s",
        expr("(unix_micros(conv_ts) - unix_micros(touch_ts)) div 1000000"))
      .withColumn("credit_micro",
        expr(s"1000000 div shiftleft(1L, cast(gap_s div $halfLifeSec as int))"))
      .select(col(userCol), col("conv_id"), col("touch_id"), col("gap_s"),
        col("credit_micro"))
  }

  /** Skip-gram pair extraction over ANY token sequence — walk paths
    * ([[Graph.hashWalks]]), token streams, event corridors: every
    * ordered (center, context) pair within `window` positions,
    * counted over the corpus. This IS the training-pair generator
    * word2vec/DeepWalk consume; downstream negative sampling is the
    * trainer's job, the engine's job is exact, reproducible pair
    * counts.
    *
    * Shape: posexplode, then each center row fans out into its 2w
    * context PROBES (`pos + δ`, δ ∈ [−w, w]\{0}) and EQUI-joins on
    * `(sid, probe)` — the window lives in the join keys, so it is
    * structural, never a post-predicate. Per-sequence comparison cost
    * is O(w·L), and both the join volume and the output are
    * `<= 2·window · Σ len`, linear in the corpus for a fixed window.
    * (The obvious alternative — a sid-only self-join with
    * `abs(a.pos − b.pos) <= w` as a residual filter — is O(L²)
    * comparisons inside one task per sequence: fine on bounded walk
    * corpora, a straggler factory on 100k-token documents. Probes
    * falling off either end of a sequence simply find no match.)
    */
  def skipgramPairs(seqs: DataFrame, seqKey: Column, tokens: Column,
      window: Int): DataFrame = {
    require(window >= 1, s"skipgramPairs: window must be >= 1, got $window")
    val ex = graft.GraftCache.registered(
      seqs.select(seqKey.as("sid"), posexplode(tokens).as(Seq("pos", "tok"))))
    val deltas = array(((-window to window).filter(_ != 0)).map(lit): _*)
    ex.select(col("sid"), col("tok").as("center"), col("pos"),
        explode(deltas).as("d"))
      .select(col("sid"), col("center"), (col("pos") + col("d")).as("cpos"))
      .join(ex.select(col("sid"), col("pos").as("cpos"),
        col("tok").as("context")), Seq("sid", "cpos"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-user conversion gaps: the time from a user's FIRST `fromType`
    * event to the first `toType` event strictly after it (the q146
    * strict-funnel semantics reduced to its two-stage timing). Two
    * user-keyed aggregates and one user-keyed join — co-partitioned,
    * no windows, no per-user sort; gaps come out in exact integer
    * microseconds ready for the percentile machinery. Feed the result
    * to [[madOutliers]] or a percentile contract for the
    * "time-to-convert" distribution.
    */
  def conversionGaps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_from"))
    events.filter(col(typeCol) === toType)
      .join(first, userCol)
      .filter(col(tsCol) > col("t_from"))
      .groupBy(col(userCol), col("t_from"))
      .agg(min(col(tsCol)).as("t_to"))
      .select(col(userCol),
        (unix_micros(col("t_to")) - unix_micros(col("t_from"))).as("gap_micros"))
  }

  /** Robust per-group outlier detection via median absolute deviation
    * — the monitoring-pipeline staple that survives the very outliers
    * it hunts (mean/stddev do not). All arithmetic is EXACT:
    * measurements quantize to integer micro-units, and medians live
    * in HALF-micro units (`round(2·median)` — an interpolated median
    * of integers is either integer or integer + ½, so doubling makes
    * it exact; the same trick again for the MAD). A point is an
    * outlier when `|2x − 2med| > k · mad2` — integer comparisons an
    * oracle replays bit-for-bit, where float medians compared in
    * doubles could flip boundary points per engine.
    *
    * Shape: two grouped exact-percentile aggregates (group-keyed
    * shuffles; swap in `percentile_approx` at corpus scale — the
    * sketch-sized state path) broadcast back onto the stream, then
    * one codegen'd comparison per row.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 5): DataFrame = {
    val vm = df.select(col(groupCol),
      round(col(valueCol).cast("double") * 1e6).cast("long").as("vm"))
    val med = vm.groupBy(col(groupCol)).agg(
      round(expr("percentile(vm, CAST(0.5 AS DOUBLE)) * 2").cast("double"))
        .cast("long").as("med2"))
    val dev = vm.join(med, groupCol)
      .withColumn("d2", abs(lit(2) * col("vm") - col("med2")))
    val mad = dev.groupBy(col(groupCol)).agg(
      round(expr("percentile(d2, CAST(0.5 AS DOUBLE)) * 2").cast("double"))
        .cast("long").as("mad4"))
    dev.join(mad, groupCol)
      // d > k·MAD  ⇔  4d > k·4MAD  ⇔  2·d2 > k·mad4 (all integers)
      .withColumn("is_outlier", lit(2L) * col("d2") > lit(k.toLong) * col("mad4"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("n"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).cast("int").as("n_outliers"),
        max(col("med2")).as("med2"), max(col("mad4")).as("mad4"))
  }

  /** Effective-dated (SCD2-style) temporal join: build versioned
    * validity intervals from a change-event stream (each change row
    * is valid from its timestamp until the key's next change —
    * half-open `[from, to)`, the last version open-ended), then join
    * facts to the version in effect at fact time. The warehouse
    * "dimension as of transaction time" primitive, with the interval
    * table DERIVED from the log — no second source of truth.
    *
    * Shape: one per-key `lead` window to close the intervals (keys
    * sort locally inside their hash partition), then a key-equi join
    * with the interval test as a RESIDUAL predicate — co-partitioned
    * by key, never a time-only range join; fan-out is bounded by
    * versions-per-key.
    */
  def effectiveDatedJoin(changes: DataFrame, facts: DataFrame,
      keyCol: String, changeTsCol: String, factTsCol: String,
      tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(changeTsCol), col(tieCol))
    val versions = changes
      .withColumn("valid_to", lead(col(changeTsCol), 1).over(w))
      .withColumnRenamed(changeTsCol, "valid_from")
    facts.join(versions, Seq(keyCol))
      .filter(col(factTsCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(factTsCol) < col("valid_to")))
  }

  /** First-order transition matrix over each user's event sequence:
    * counts of (previous type → type) adjacencies, ordered by
    * `(ts, tieCol)` — the tie column makes same-timestamp ordering
    * deterministic, so the matrix is engine-exact. One window pass
    * partitioned by user (per-user sequences sort locally inside
    * their hash partition — no global sort) + one counting aggregate.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("prev", lag(col(typeCol), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col(typeCol).as("cur"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Refuse an edge list that is not symmetrized. k-core degree is
    * computed on `src` alone, which is only the true undirected degree
    * when every edge carries its reverse — a caller handing a
    * one-directional list would get silently wrong cores. The check is
    * the [[Dedup.requireBoundedBlocks]] posture applied to input
    * contracts: one aggregate comparing the order-free hash-sums of
    * (src,dst) and (dst,src) — equal iff (probabilistically, same
    * confidence class as CC's convergence signature) the edge multiset
    * equals its own reverse. One scan, two decimal sums.
    */
  private[graft] def requireSymmetrized(e: DataFrame): Unit = {
    val r = e.agg(
      sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("fwd"),
      sum(xxhash64(col("dst"), col("src")).cast("decimal(38,0)")).as("rev"))
      .collect().head
    if (!java.util.Objects.equals(r.get(0), r.get(1)))
      throw new IllegalArgumentException(
        "k-core requires a SYMMETRIZED edge list (every edge with its " +
          "reverse): the (src,dst) and (dst,src) hash-sums differ. Run the " +
          "input through Graph.symmetrize first.")
  }

  /** `rounds` iterations of k-core peeling over a SYMMETRIZED edge
    * list (checked — see [[requireSymmetrized]]): drop nodes with
    * degree < k, drop edges touching them, repeat — after enough
    * rounds the fixpoint is the k-core (community kernel / spam-farm
    * detector); [[kcoreFixpoint]] peels to convergence instead of a
    * guessed round count. Returns per-round `(round, n_nodes,
    * n_edges)` — n_edges counts directed arcs. Each round is one
    * degree aggregate + two semi-joins, all keyed on node ids;
    * lineage is cut per round via [[Iterative.pin]] (reliable into
    * `checkpointDir` on a real cluster).
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    val pin = Iterative.pin(sp, checkpointDir)
    // pin the input FIRST: the symmetry guard, round-1 degree aggregate
    // and round-1 joins all read it — unpinned, the upstream pipeline
    // (symmetrize's union+distinct) would execute once per consumer
    var e = pin(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    requireSymmetrized(e)
    val stats = (1 to rounds).map { r =>
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      val next = pin(e.join(keep.withColumnRenamed("node", "src"), "src")
        .join(keep.withColumnRenamed("node", "dst"), "dst")
        .select(col("src"), col("dst")))
      e.unpersist(blocking = false)
      e = next
      // ONE aggregate for both cascade stats — the x100 soak measured
      // the separate distinct().count() + count() pair as two full
      // passes over a 140M-arc frame per round
      val st = e.agg(countDistinct(col("src")).as("n"), count(lit(1)).as("m")).head()
      (r, st.getLong(0), st.getLong(1))
    }
    e.unpersist(blocking = false)
    stats.toDF("round", "n_nodes", "n_edges")
  }

  /** k-core peeling to the FIXPOINT — [[kcorePeel]] without the guessed
    * round count: peel until a round removes nothing (the k-core) or
    * empties the graph. Returns the full cascade, one row per round
    * with surviving edges, starting at round 0 (the input): the
    * shape an analyst reads to see how fast the periphery sheds.
    * Convergence detection is count-based and EXACT (not a hash
    * signature): survivors are always a subset of the current set, so
    * equal counts imply equal sets. Rounds that would be empty emit no
    * row — the cascade ends at the last non-empty edge set either way,
    * which keeps the frame identical to the recursive-CTE oracle
    * rendering (q216). Per round: one degree aggregate + two
    * semi-join-shaped filters, lineage cut via [[Iterative.pin]]
    * (reliable into `checkpointDir` on a real cluster).
    */
  def kcoreFixpoint(edges: DataFrame, k: Int, maxRounds: Int = 100,
      checkpointDir: Option[String] = None): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    val pin = Iterative.pin(sp, checkpointDir)
    var e = pin(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    requireSymmetrized(e)
    // one aggregate per round for (n_nodes, n_edges) — see kcorePeel
    def stats(d: DataFrame): (Long, Long) = {
      val st = d.agg(countDistinct(col("src")).as("n"), count(lit(1)).as("m")).head()
      (st.getLong(0), st.getLong(1))
    }
    val (n0, m0) = stats(e)
    var prevEdges = m0
    val rows = scala.collection.mutable.ArrayBuffer((0, n0, m0))
    var r = 1
    var done = prevEdges == 0L
    while (!done) {
      if (r > maxRounds) {
        e.unpersist(blocking = false)
        throw new IllegalStateException(
          s"kcoreFixpoint did not converge within maxRounds=$maxRounds " +
            "(peeling always converges within the node count — raise maxRounds)")
      }
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      val next = pin(e.join(keep.withColumnRenamed("node", "src"), "src")
        .join(keep.withColumnRenamed("node", "dst"), "dst")
        .select(col("src"), col("dst")))
      val (nNodes, nEdges) = stats(next)
      if (nEdges == prevEdges || nEdges == 0L) {
        done = true
        next.unpersist(blocking = false)
        e.unpersist(blocking = false)
      } else {
        rows += ((r, nNodes, nEdges))
        e.unpersist(blocking = false)
        e = next; prevEdges = nEdges; r += 1
      }
    }
    rows.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** Top event-type n-grams: the most common length-`n` runs of
    * consecutive event types per entity — the path-mining face of the
    * transition matrix (q147 reads where users go NEXT; this reads
    * the whole corridor). `orderCols` must be a TOTAL order within an
    * entity (e.g. `(ts, event_id)`) or the run sequence — and the
    * hash — is engine-dependent.
    *
    * Scale: one hash exchange on the entity key + an in-partition
    * sort (the sessionization shape), `n-1` `lead`s over that single
    * window (one pass, no self-joins), then a map-side-combined count
    * over the n-gram strings. Only the k winners leave via
    * `TakeOrderedAndProject`. State per entity is the window frame,
    * not the history.
    */
  def eventNgrams(events: DataFrame, entity: Column, orderCols: Seq[Column],
      etype: Column, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"eventNgrams: n must be >= 2, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entity).orderBy(orderCols: _*)
    val steps = (0 until n).map { i =>
      if (i == 0) etype else lead(etype, i).over(w)
    }
    events
      .select(concat_ws(">", steps: _*).as("path"),
        steps.last.isNotNull.as("complete"))
      .filter(col("complete"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path")).limit(k)
  }
}
