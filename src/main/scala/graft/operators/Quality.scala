package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-quality and governance audits — the gate a corpus passes
  * through before it is allowed to feed training or analytics:
  * one-pass column profiling, referential-integrity (orphan FK)
  * audits, k-anonymity grouping risk, and join-key skew profiling.
  *
  * The reference engine has no quality surface (its pipelines assume
  * trusted inputs, `/root/reference/README.md` examples go straight
  * from read to map); at 100 TB nobody gets to assume that, so these
  * are first-class operators with the same integer-deterministic,
  * oracle-replayable discipline as the rest of the engine.
  */
object Quality {

  /** One-pass column profile: per column the row count, non-null
    * count, exact distinct count, and min/max rendered as strings
    * (cast AFTER aggregation, so numeric min/max are computed in the
    * native type and only displayed as text).
    *
    * Scale: ONE scan. The n exact `countDistinct`s plan via Expand —
    * an n× multiplier on the aggregated row stream, the price of
    * exactness in one pass (the x100 soak of the count+countDistinct
    * pair measured Expand ≡ two separate jobs, NOTES_r10). For a
    * cheaper audit at extreme width pass `exact = false`: HLL
    * `approx_count_distinct` keeps the scan single-pass without the
    * Expand multiplier. Profiles of 100 TB tables are how you notice
    * the upstream loader silently nulled a column — run it per
    * ingest batch, not per query.
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nn").as("n_nonnull"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_str"), col(s"${c}__mx").as("max_str"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** One referential-integrity relation to audit: rows of `child`
    * whose `childKey` has no match in `parent.parentKey`. */
  final case class FkRel(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  /** Referential-integrity audit over a set of FK relations: per
    * relation the child row count, distinct child keys, and orphan
    * rows/keys (non-null child keys absent from the parent).
    *
    * Scale: per relation ONE pass over the child — the parent's
    * distinct keys (aggregated before the join, so the build side is
    * keys not rows) left-join onto the child with a match marker, and
    * a single aggregate reads totals and orphans together. Dimension
    * parents broadcast under AQE's size rule; fact-to-fact relations
    * fall back to a keyed hash join. Null child keys are NOT orphans
    * (SQL FK semantics) — they surface separately in
    * [[profileColumns]]' non-null counts.
    */
  def fkOrphans(relations: Seq[FkRel]): DataFrame = {
    require(relations.nonEmpty, "fkOrphans: need at least one relation")
    relations.map { r =>
      val pk = r.parent.select(col(r.parentKey).as("__pk")).distinct()
      r.child.select(col(r.childKey).as("__ck"))
        .join(pk.withColumn("__hit", lit(1)), col("__ck") === col("__pk"), "left_outer")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("__ck")).as("n_keys"),
          sum(when(col("__ck").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("n_orphan_rows"),
          countDistinct(when(col("__hit").isNull, col("__ck"))).as("n_orphan_keys"))
        .select(lit(r.name).as("relation"), col("n_rows"), col("n_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"))
    }.reduce(_ unionAll _)
  }

  /** k-anonymity profile: group the table by its quasi-identifier
    * columns and report the group-size histogram — how many identity
    * groups (and how many rows) exist at each anonymity level. A row
    * in a size-1 group is fully re-identifiable by the quasi
    * identifiers alone; policy says every group must reach size >= k
    * before release. The histogram IS the risk report: everything
    * below the caller's k is the violation mass.
    *
    * Scale: one keyed aggregate over the quasi tuple (map-side
    * combined) + one tiny aggregate over the group sizes. No
    * collect, no window.
    */
  def kAnonymityProfile(df: DataFrame, quasi: Seq[Column]): DataFrame =
    df.groupBy(quasi: _*).agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("group_size")).as("n_rows"))

  /** Join-key skew profile: the top-N heaviest keys with each key's
    * share (and running cumulative share) of all rows, in exact
    * micro units — the diagnostic you run BEFORE choosing a salt
    * factor or trusting AQE's skew-join split. A key above ~5% of
    * rows is a straggler task at any cluster size.
    *
    * Scale: one map-side-combined count per key; the total is one
    * more reduce over the key counts; only the N winners leave the
    * executors (`TakeOrderedAndProject`), and the cumulative window
    * runs on those N rows alone — bounded by construction, never by
    * luck.
    */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 25): DataFrame = {
    val counts = graft.GraftCache.registered(
      df.select(key.as("key")).groupBy(col("key"))
        .agg(count(lit(1)).as("n_rows")))
    val total = broadcast(counts.agg(sum(col("n_rows")).as("n_total")))
    val ord = Seq(col("n_rows").desc, col("key").asc)
    val top = counts.orderBy(ord: _*).limit(topN)
    // the window input is the N winners only — single partition by
    // construction (topN rows), not by accident
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(total)
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .select(col("key"), col("n_rows"),
        expr("n_rows * 1000000 div n_total").as("share_micro"),
        expr("cum_rows * 1000000 div n_total").as("cum_micro"))
  }

  /** Expectation-suite runner: evaluate every named predicate in ONE
    * scan and report per rule how many rows pass. A NULL predicate
    * (e.g. a range check on a null value) counts as a FAILURE — an
    * expectation that cannot be confirmed is not met, which is the
    * contract that catches the silently-nulled column instead of
    * waving it through.
    *
    * Scale: one pass, one conditional sum per rule, no Expand (unlike
    * [[profileColumns]]' exact distincts) — rules are cheap enough to
    * run per ingest batch on the full feed.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations: need at least one rule")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"${name}__p")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col("n_rows"),
        col(s"${name}__p").as("n_pass"),
        (col("n_rows") - col(s"${name}__p")).as("n_fail"),
        expr(s"`${name}__p` * 1000000 div n_rows").as("pass_micro"))
    }
    one.select(explode(array(stacked: _*)).as("r")).select(col("r.*"))
  }

  /** Calendar completeness of a dated feed: against the day spine
    * spanning the data's own [min, max], report how many days are
    * present, missing, and the longest consecutive missing run — the
    * freshness/gap audit that catches a loader that silently skipped
    * a partition. A value-anomaly monitor (q175) can't see a day that
    * produced NO rows; this is the operator that can.
    *
    * Scale: the heavy part is the per-day count (map-side combined);
    * the spine is `sequence()` over the calendar — bounded by the
    * span in DAYS, not the corpus — so the gap-run window runs on at
    * most a few thousand rows by construction.
    */
  def completeness(df: DataFrame, day: Column): DataFrame = {
    // daily feeds the spine bounds, the gap-run pass AND the summary —
    // persist the per-day counts or the corpus scans three times
    val daily = graft.GraftCache.registered(
      df.select(day.cast("date").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n")))
    val spine = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val flagged = spine.join(daily, Seq("day"), "left_outer")
      .select(col("day"), col("n").isNull.as("gap"))
    // run-length of consecutive gap days: day-index minus rank within
    // the gap set is constant per run (the islands trick); the window
    // input is the calendar spine — bounded, single partition by design
    val w = Window.orderBy(col("day"))
    val runs = flagged.filter(col("gap"))
      .withColumn("grp", datediff(col("day"), to_date(lit("1970-01-01"))) -
        row_number().over(w))
      .groupBy(col("grp")).agg(count(lit(1)).as("run"))
    val maxRun = broadcast(runs.agg(
      coalesce(max(col("run")), lit(0L)).as("max_gap_days")))
    // coalesce: on an EMPTY feed the spine is empty, so the sums are
    // null while max_gap_days is already coalesced — the report must
    // be uniformly all-zeros or a composing gate (q249) propagates null
    flagged.agg(count(lit(1)).as("n_span_days"),
        coalesce(sum(when(col("gap"), 0L).otherwise(1L)), lit(0L))
          .as("n_present_days"),
        coalesce(sum(when(col("gap"), 1L).otherwise(0L)), lit(0L))
          .as("n_missing_days"))
      .crossJoin(maxRun)
  }

  /** l-diversity profile — k-anonymity's blind spot: a group can be
    * large (k-safe) while every member shares the SAME sensitive
    * value, so membership alone discloses it. Groups by the quasi
    * identifiers and histograms the number of DISTINCT sensitive
    * values per group; every group at l = 1 is a disclosure, and the
    * caller's policy floor applies to the whole histogram.
    *
    * Scale: one keyed aggregate over the quasi tuple (map-side
    * combined distinct) + one tiny reduce — same shape as
    * [[kAnonymityProfile]], graded beside it.
    */
  def lDiversityProfile(df: DataFrame, quasi: Seq[Column],
      sensitive: Column): DataFrame =
    df.groupBy(quasi: _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("n"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"))

  /** Functional-dependency audit: does `lhs -> rhs` hold? Reports the
    * group count, how many lhs groups map to MORE than one rhs value
    * (the violations), and the worst group's variant count. An FD the
    * schema claims but the data breaks is how a "dimension" silently
    * fans out a join.
    *
    * Scale: one keyed aggregate over lhs (map-side combined
    * countDistinct of rhs per group) + one tiny reduce over group
    * stats.
    */
  def fdViolations(df: DataFrame, lhs: Seq[Column], rhs: Column): DataFrame =
    df.groupBy(lhs: _*).agg(countDistinct(rhs).as("variants"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("variants") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("variants")).as("max_variants"))
}
