package graft

import org.apache.spark.sql.functions._
import graft.operators.Features

/** Laws for the feature-engineering/ML-observability operators —
  * each checked against an independent brute-force computation on
  * randomized (seeded) data, not against themselves.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact equals the brute-force pair formula under heavy ties") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(400)(i => (rnd.nextInt(12).toLong, rnd.nextBoolean()))
    val df = rows.toDF("s", "y")
    val got = Features.aucExact(df, col("y"), col("s")).as[(Long, Long, Long, Long)].head()

    // brute force: over all pos-neg pairs, wins + half-ties
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(got._1 === pos.size.toLong)
    assert(got._2 === neg.size.toLong)
    assert(got._3 === u2)
    assert(got._4 === u2 * 1000000L / (2L * pos.size * neg.size))
  }

  test("aucExact is 1.0 for a perfectly separating score and 0.5 for a constant") {
    val perfect = Seq.tabulate(50)(i => (i.toLong, i >= 25)).toDF("s", "y")
    assert(Features.aucExact(perfect, col("y"), col("s"))
      .select("auc_micro").as[Long].head() === 1000000L)
    val const = Seq.tabulate(50)(i => (5L, i % 2 == 0)).toDF("s", "y")
    assert(Features.aucExact(const, col("y"), col("s"))
      .select("auc_micro").as[Long].head() === 500000L)
  }

  test("maxConcurrency matches a brute-force sweep, half-open intervals") {
    val rnd = new scala.util.Random(11)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val rows = Seq.tabulate(300)(i => (s"g${i % 3}", rnd.nextInt(2000).toLong))
    val df = rows.map { case (g, s) => (g, ts(s)) }.toDF("grp", "t")
    val got = Features.maxConcurrency(df, col("grp"), col("t"), 60)
      .as[(String, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    for (g <- Seq("g0", "g1", "g2")) {
      val starts = rows.filter(_._1 == g).map(_._2)
      // concurrency only changes at starts; [s, s+60) half-open
      val brute = starts.map(t => starts.count(s => s <= t && t < s + 60)).max
      assert(got(g)._1 === starts.size.toLong, s"n_intervals for $g")
      assert(got(g)._2 === brute, s"max_conc for $g")
    }
  }

  test("maxConcurrency: intervals crossing the day partition boundary carry correctly") {
    // midnight UTC 2024-01-02 = epoch 1704153600s; three intervals all
    // open across midnight plus one the next morning -> max 3 reached
    // in the minutes before AND after the boundary; a day-partitioned
    // sweep without carry would report 1 for day 2's opening state.
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val mid = 1704153600L
    val df = Seq(
      ("a", ts(mid - 100)), ("a", ts(mid - 60)), ("a", ts(mid - 30)), // all span midnight (dur 300)
      ("a", ts(mid + 3600))).toDF("grp", "t")
    val got = Features.maxConcurrency(df, col("grp"), col("t"), 300)
      .as[(String, Long, Int)].head()
    assert(got._2 === 4L)
    assert(got._3 === 3)
  }

  test("maxConcurrency: back-to-back intervals never double-count") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    // [0,60) and [60,120): end meets start exactly — concurrency stays 1
    val df = Seq(("a", ts(0)), ("a", ts(60))).toDF("grp", "t")
    val got = Features.maxConcurrency(df, col("grp"), col("t"), 60)
      .select("max_conc").as[Int].head()
    assert(got === 1)
  }

  test("psiDrift: identical distributions give zero PSI, counts cover both sides") {
    val ref = (0L until 1000L).map(i => i % 100).toDF("vm")
    val got = Features.psiDrift(ref, ref, col("vm")).collect()
    assert(got.length === 10)
    assert(got.map(_.getLong(1)).sum === 1000L)
    assert(got.map(_.getLong(2)).sum === 1000L)
    assert(got.forall(r => math.abs(r.getDouble(3)) < 1e-12))
  }

  test("psiDrift: out-of-range current values clamp to edge buckets; PSI positive under shift") {
    val ref = (0L until 500L).map(i => i % 100).toDF("vm")
    val cur = (0L until 500L).map(i => i % 100 + 200).toDF("vm") // all beyond ref max
    val rows = Features.psiDrift(ref, cur, col("vm")).collect()
    val byBucket = rows.map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(byBucket(9) === 500L) // everything clamps high
    assert((0 to 8).forall(b => byBucket(b) === 0L))
    assert(rows.map(_.getDouble(3)).sum > 0.5) // strong drift reads as large PSI
  }

  test("targetEncode shrinks rare categories toward the global prior") {
    val df = (Seq.fill(500)(("common", 1000000L)) ++ Seq(("rare", 9000000L)))
      .toDF("k", "vm")
    val got = Features.targetEncode(df, col("k"), col("vm"), m = 20)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val prior = (500L * 1000000L + 9000000L) / 501L
    // rare category: 1 observation of 9e6 shrinks close to the prior
    val rare = got("rare")._4
    assert(rare > prior && rare < 9000000L)
    assert(rare === (9000000L + prior * 20) / 21)
    // common category barely moves
    val common = got("common")._4
    assert(math.abs(common - 1000000L) < 100000L)
  }

  test("welchAB matches a direct computation") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(600)(i => (i % 2 == 0, (rnd.nextInt(5000) + 100).toLong))
    val df = rows.toDF("a", "c")
    val got = Features.welchAB(df, col("a"), col("c"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val as = rows.filter(_._1).map(_._2); val bs = rows.filterNot(_._1).map(_._2)
    assert(got._1 === as.size.toLong && got._2 === bs.size.toLong)
    assert(got._3 === as.sum && got._4 === bs.sum)
    val ma = as.sum.toDouble / as.size; val mb = bs.sum.toDouble / bs.size
    def varOf(xs: Seq[Long]) = {
      val m = xs.sum.toDouble / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val z = (ma - mb) / math.sqrt(varOf(as) / as.size + varOf(bs) / bs.size)
    assert(math.abs(got._6 - z) < 1e-4)
    assert(math.abs(got._5 - (ma - mb)) < 1e-4)
  }

  test("ksTest: identical samples give 0; disjoint samples give 1e6; matches brute force") {
    val rnd = new scala.util.Random(31)
    val xs = Seq.fill(300)(rnd.nextInt(40).toLong)
    val ys = Seq.fill(200)(rnd.nextInt(40).toLong + 10)
    val same = Features.ksTest(xs.toDF("v"), xs.toDF("v"), col("v"))
      .select("ks_r6").as[Double].head()
    assert(same === 0.0)
    val disjoint = Features.ksTest(Seq(1L, 2L).toDF("v"), Seq(10L, 11L).toDF("v"), col("v"))
      .select("ks_r6").as[Double].head()
    assert(disjoint === 1.0)
    // brute force over all candidate thresholds
    val got = Features.ksTest(xs.toDF("v"), ys.toDF("v"), col("v"))
      .as[(Long, Long, Long, Double)].head()
    val brute = (xs ++ ys).distinct.map { t =>
      math.abs(xs.count(_ <= t).toLong * ys.size - ys.count(_ <= t).toLong * xs.size)
    }.max
    assert(got._3 === brute)
    assert(math.abs(got._4 - brute.toDouble / (xs.size.toLong * ys.size)) < 1e-6)
  }

  test("balanceClasses: every class downsampled to the minority count, deterministically") {
    val df = (Seq.tabulate(90)(i => ("big", i.toLong)) ++
      Seq.tabulate(40)(i => ("mid", 1000L + i)) ++
      Seq.tabulate(15)(i => ("small", 2000L + i))).toDF("lbl", "id")
    val out = Features.balanceClasses(df, col("lbl"), col("id"))
    val counts = out.groupBy("lbl").count().as[(String, Long)].collect().toMap
    assert(counts === Map("big" -> 15L, "mid" -> 15L, "small" -> 15L))
    // deterministic: second run keeps the same ids
    val out2 = Features.balanceClasses(df, col("lbl"), col("id"))
    assert(out.select("id").as[Long].collect().sorted.toSeq ===
      out2.select("id").as[Long].collect().sorted.toSeq)
    // schema passthrough: original columns survive
    assert(out.columns.toSeq === Seq("lbl", "id"))
  }

  test("slopePerKey matches closed-form OLS; zero-variance x gives null") {
    // y = 3x + 7 exactly -> slope_micro = 3_000_000
    val exact = Seq.tabulate(20)(x => ("a", x.toLong, 3L * x + 7))
    val flat = Seq.tabulate(5)(i => ("b", 2L, i.toLong)) // all x equal
    val got = Features.slopePerKey((exact ++ flat).toDF("k", "x", "y"),
        col("k"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(got("a") === Some(3000000L))
    assert(got("b") === None)
  }

  test("kaplanMeier matches hand-computed curve with censoring and a zero-crossing tail") {
    // subjects: events at t=1 (2 of 5 at risk), censor at t=2,
    // events at t=3 (both remaining) -> curve 0.6, then 0
    val subjects = Seq((1L, 1), (1L, 1), (2L, 0), (3L, 1), (3L, 1)).toDF("t", "ev")
    val rows = Features.kaplanMeier(subjects, col("t"), col("ev"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq === Seq((1L, 5L, 2L), (3L, 2L, 2L)))
    assert(math.abs(rows(0)._4 - 0.6) < 1e-9)
    assert(rows(1)._4 === 0.0) // d == n_risk: the curve hits zero, no ln(0) blowup
  }

  test("liftPairs on explicit baskets matches hand computation") {
    import graft.operators.Curation
    // 4 baskets; items x,y together twice, x,z once
    val inc = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
      (4L, "z")).toDF("b", "i")
    val universe = Seq(1L, 2L, 3L, 4L).toDF("b")
    val got = Curation.liftPairs(inc, col("b"), col("i"), universe,
        minSupport = 1, minPair = 2, maxPerBasket = 10, k = 10)
      .as[(String, String, Int, Int, Int, Long)].collect()
    assert(got.length === 1)
    val (a, b, npair, na, nb, lift) = got.head
    assert((a, b, npair, na, nb) === ("x", "y", 2, 3, 2))
    assert(lift === 2L * 4 * 1000000 / (3 * 2))
  }

  test("pitJoin matches a brute-force correlated lookup; strict mode never leaks same-instant features") {
    val rnd = new scala.util.Random(43)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val feats = Seq.tabulate(200)(i =>
      (i % 5L, ts(rnd.nextInt(100).toLong), i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "t", "seq", "v")
    val labels = Seq.tabulate(60)(i => (i % 5L, ts(rnd.nextInt(100).toLong), 1000L + i))
      .toDF("k", "t", "lid")

    val got = Features.pitJoin(labels, feats, Seq("k"), "t", "seq", Seq("v"), strict = true)
      .select(col("lid"), col("v")).as[(Long, Option[Long])].collect().toMap

    val fRows = feats.as[(Long, java.sql.Timestamp, Long, Long)].collect()
    for ((k, t0, lid) <- labels.as[(Long, java.sql.Timestamp, Long)].collect()) {
      val prior = fRows.filter(f => f._1 == k && f._2.getTime < t0.getTime)
      val want = if (prior.isEmpty) None
        else Some(prior.maxBy(f => (f._2.getTime, f._3))._4)
      assert(got(lid) === want, s"label $lid")
    }

    // leakage probe: a feature at EXACTLY the label instant is invisible
    // in strict mode, visible in inclusive mode
    val f1 = Seq((1L, ts(50), 7L, 999L)).toDF("k", "t", "seq", "v")
    val l1 = Seq((1L, ts(50), 1L)).toDF("k", "t", "lid")
    val strictV = Features.pitJoin(l1, f1, Seq("k"), "t", "seq", Seq("v"), strict = true)
      .select("v").as[Option[Long]].head()
    val inclV = Features.pitJoin(l1, f1, Seq("k"), "t", "seq", Seq("v"), strict = false)
      .select("v").as[Option[Long]].head()
    assert(strictV === None)
    assert(inclV === Some(999L))
  }

  test("CUSUM prefix-min identity equals the sequential recurrence on random series") {
    // the q204 kernel: S_t = P_t - min(0, min_{j<=t} P_j) must equal
    // the textbook S_t = max(0, S_{t-1} + d_t) for any drift sequence
    val rnd = new scala.util.Random(59)
    for (_ <- 1 to 20) {
      val d = Seq.fill(40)(rnd.nextInt(2001).toLong - 1000)
      val seq = d.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      val prefix = d.scanLeft(0L)(_ + _).tail
      val viaIdentity = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, prefix.take(i + 1).min)
      }
      assert(viaIdentity === seq)
    }
  }

  test("windowed funnel drops stages that land outside the gap; unbounded twin keeps them") {
    import graft.operators.Sequence
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    // u1: view@0, click@30, purchase@50 (all inside a 60s window)
    // u2: view@0, click@100 (click outside the 60s window)
    // u3: view@0, click@30, purchase@200 (purchase outside)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(30), "click"), (1L, ts(50), "purchase"),
      (2L, ts(0), "view"), (2L, ts(100), "click"),
      (3L, ts(0), "view"), (3L, ts(30), "click"), (3L, ts(200), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val stages = Seq("view", "click", "purchase")
    def counts(gap: Option[Long]) =
      Sequence.funnel(ev, "user_id", "ts", "event_type", stages, gap)
        .orderBy("stage_idx").select("n_users").as[Int].collect().toSeq
    assert(counts(Some(60L)) === Seq(3, 2, 1))
    assert(counts(None) === Seq(3, 3, 2))
    // boundary: exactly at the gap is IN (<=)
    val edge = Seq((9L, ts(0), "view"), (9L, ts(60), "click")).toDF("user_id", "ts", "event_type")
    assert(Sequence.funnel(edge, "user_id", "ts", "event_type", Seq("view", "click"), Some(60L))
      .orderBy("stage_idx").select("n_users").as[Int].collect().toSeq === Seq(1, 1))
  }

  test("no FeatureQueries plan contains an unbounded CartesianProduct") {
    // broadcast-1-row crossJoins plan as BroadcastNestedLoopJoin — fine;
    // a CartesianProduct means a real unbounded quadratic slipped in.
    for ((name, fn) <- graft.queries.FeatureQueries.queries) {
      val plan = fn(spark, sf001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a CartesianProduct")
    }
  }

  // VERDICT r9 item 6: the unpartitioned window contract is "distinct
  // scores/values only" — a high-cardinality metric must REFUSE with a
  // pointer at pre-quantization, not silently run a one-task sort.
  test("aucExact and ksTest refuse high-cardinality inputs under the window cap") {
    val df = Seq.tabulate(50)(i => (i.toLong, i % 2 == 0)).toDF("s", "y")
    spark.conf.set("graft.window.maxDistinct", "10")
    try {
      val exA = intercept[IllegalArgumentException] {
        Features.aucExact(df, col("y"), col("s"))
      }
      assert(exA.getMessage.contains("graft.window.maxDistinct") &&
        exA.getMessage.contains("quantize"), exA.getMessage)
      val exK = intercept[IllegalArgumentException] {
        Features.ksTest(df.select(col("s")), df.select((col("s") + 100).as("s")), col("s"))
      }
      assert(exK.getMessage.contains("graft.window.maxDistinct"), exK.getMessage)
      // a pre-quantized (bounded) score passes under the same cap
      val ok = Features.aucExact(df.select((col("s") % 5).as("s"), col("y")),
        col("y"), col("s")).collect()
      assert(ok.length === 1)
    } finally spark.conf.unset("graft.window.maxDistinct")
  }

  // ADVICE r9: with a degenerate reference range (mx == mn) a current
  // value more than 2^31 micro-units above mn used to wrap Int
  // negative BEFORE the clamp and land in bucket 0, inverting the
  // drift signal. The clamp now runs in long; far-above-range drift
  // must land in the TOP bucket.
  test("psiDrift: degenerate reference range with far-out current values lands in bucket 9") {
    val ref = Seq.fill(20)(5L).toDF("vm")          // mx == mn == 5
    val cur = Seq.fill(20)(5L + 3000000000L).toDF("vm") // +3e9 > 2^31
    val rows = Features.psiDrift(ref, cur, col("vm")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0)._1 === 20L && rows(0)._2 === 0L) // all ref mass in 0
    assert(rows(9)._1 === 0L && rows(9)._2 === 20L) // all cur mass in 9
  }

  // ADVICE r9: a multi-column universe frame would silently take
  // countDistinct of whatever column is first — refuse instead.
  test("liftPairs refuses a multi-column universe frame") {
    import graft.operators.Curation
    val inc = Seq((1L, "x"), (1L, "y")).toDF("b", "i")
    val badUniverse = Seq((1L, "z")).toDF("b", "extra")
    val ex = intercept[IllegalArgumentException] {
      Curation.liftPairs(inc, col("b"), col("i"), badUniverse,
        minSupport = 1, minPair = 1, maxPerBasket = 10, k = 10)
    }
    assert(ex.getMessage.contains("basket-id column"))
    graft.GraftCache.releaseAll()
  }

  test("featureHashStats: bucket loads sum to the corpus token count") {
    val df = Seq((1L, "a b c a"), (2L, "b c d"), (3L, "e f")).toDF("id", "text")
    val got = Features.featureHashStats(df, col("id"), col("text"), 8).collect()
    assert(got.map(_.getLong(1)).sum === 9L) // total tokens
    assert(got.forall(r => r.getLong(2) <= r.getLong(1))) // terms <= tokens
    assert(got.forall(r => r.getLong(3) <= 3L)) // docs bounded
    // determinism: same input, same buckets
    val again = Features.featureHashStats(df, col("id"), col("text"), 8).collect()
    assert(got.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }
}
