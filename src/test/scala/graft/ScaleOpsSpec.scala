package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Graph, Similarity, Sketch}

/** Specs for the scale-pipeline operator pack (graph analytics,
  * co-occurrence mining, deterministic sampling/sharding, repetition
  * rules, integer k-means) on crafted inputs with exact expectations.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt: a symmetric cycle is a fixed point of the update") {
    // 4-cycle: every node has degree 2 and receives exactly what it
    // emits, so rank stays at initMass for any iteration count.
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(Graph.symmetrize(pairs), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size === 4)
    assert(ranks.values.forall(_ === 1000000L))
  }

  test("pageRankInt: star center outranks leaves and mass is bounded") {
    val pairs = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val ranks = Graph.pageRankInt(Graph.symmetrize(pairs), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L))
    assert((1L to 6L).map(ranks).distinct.size === 1) // leaves symmetric
    // total mass never exceeds the injected total (truncation only loses)
    assert(ranks.values.sum <= 7L * 1000000L)
  }

  test("bfsLevels assigns shortest-hop distances from the seed set") {
    // path 0-1-2-3-4-5 plus a shortcut 0-4: node 4 is dist 1, node 5 dist 2
    val pairs = ((0L to 4L).map(i => (i, i + 1)) :+ (0L, 4L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val d = Graph.bfsLevels(Graph.symmetrize(pairs), seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(0L -> 0, 1L -> 1, 4L -> 1, 2L -> 2, 3L -> 2, 5L -> 2))
  }

  test("degreeHistogram buckets exact powers of two correctly") {
    // star with 8 leaves: center degree 8 -> bucket 3 (the log2-ulp trap)
    val pairs = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val h = Graph.degreeHistogram(Graph.symmetrize(pairs))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h === Map(3 -> 1L, 0 -> 8L)) // center in bucket 3, leaves in 0
  }

  test("triangleCounts: K4 has 4 triangles, 3 per corner") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("u", "v")
    val t = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("degreeRelabel: hub edges orient INTO the hub (no deg² wedge mid), triangles invariant") {
    // hub 500 linked to every other node, plus triangle (1,2,3):
    // triangles are (1,2,3) and the three hub-closed ones
    val hubEdges = (0 until 1000).filter(_ != 500)
      .map(i => (math.min(i, 500).toLong, math.max(i, 500).toLong))
    val e = (hubEdges ++ Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("u", "v")
    val o = Graph.degreeRelabel(e)
    // max-degree node must have out-degree 0 in the orientation — the
    // lever's whole point: the hub can never be a wedge mid
    assert(o.filter(col("u") === 500L).count() === 0L)
    assert(o.count() === e.count()) // orientation is a bijection on edges
    val fast = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = Graph.triangleCounts(e, orientByDegree = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === naive)
    assert(fast(500L) === 3L && fast(1L) === 3L && !fast.contains(4L))
    graft.GraftCache.releaseAll()
  }

  test("projectBipartite projects shared-key pairs and rejects hot keys") {
    val pairs = Seq(("k1", 1L), ("k1", 2L), ("k1", 3L), ("k2", 2L), ("k2", 3L))
      .toDF("k", "s")
    val e = Graph.projectBipartite(pairs, "k", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val ex = intercept[IllegalArgumentException] {
      Graph.projectBipartite(pairs, "k", "s", maxPerKey = 2)
    }
    assert(ex.getMessage.contains("maxPerKey"))
  }

  test("personalizedPageRankInt: mass radiates from the seed and decays") {
    // path 0-1-2-3-4-5, seed {0}, 2 supersteps: only nodes within
    // distance 2 hold walked-in mass (plus the seed's teleport).
    val pairs = (0L to 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(Tuple1(0L)).toDF("node")
    val r = Graph.personalizedPageRankInt(Graph.symmetrize(pairs), seeds, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(0L, 1L, 2L)) // distance <= iters only
    // the seed holds the maximum (walked-in + exclusive teleport);
    // per-step mass is NOT monotone in distance (path parity ping-pong)
    assert(r(0L) === r.values.max)
    assert(r.values.sum <= 1000000L + 2 * 150000L) // walked + 2 teleports
  }

  test("hllOverlapMatrix estimates overlap within the sketch error bound") {
    // tags A/B: 20k keys each, 10k shared
    val rows = ((0 until 20000).map(i => ("A", s"key$i")) ++
      (10000 until 30000).map(i => ("B", s"key$i"))).toDF("tag", "k")
    val m = Sketch.hllOverlapMatrix(rows, "tag", "k", lgK = 14).collect()
    assert(m.length === 1)
    val est = m.head.getAs[Long]("est_overlap")
    // union = 30k; lgK=14 → rsd 0.8%; 3-term inclusion-exclusion stays
    // well inside 2% of the union
    assert(math.abs(est - 10000L) <= 600L, s"est_overlap=$est")
  }

  test("funnel enforces strict event order per user") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"), // completes
      (2L, ts(1), "purchase"), (2L, ts(2), "view"),  // purchase BEFORE view: stops at view
      (3L, ts(1), "view"), (3L, ts(2), "purchase")   // skips click: stops at view
    ).toDF("user_id", "ts", "event_type")
    val f = graft.operators.Sequence.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getAs[Int]("n_users")).toMap
    assert(f === Map("view" -> 3, "click" -> 1, "purchase" -> 1))
  }

  test("cohortRetention buckets users by first-seen week") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val ev = Seq(
      (1L, ts(0)), (1L, ts(8)),  // cohort week 0, active weeks 0 and 1
      (2L, ts(8))                // cohort week 1, active week 1
    ).toDF("user_id", "ts")
    val m = graft.operators.Sequence.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("n_users")).toMap
    assert(m === Map((0L, 0L) -> 1, (0L, 1L) -> 1, (1L, 0L) -> 1))
  }

  test("kcorePeel strips the pendant and keeps the clique") {
    // K4 (0-3) plus pendant node 4 hanging off 0; k=3 removes only 4
    val pairs = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (0L, 4L))).toDF("src", "dst")
    val r = graft.operators.Sequence.kcorePeel(Graph.symmetrize(pairs), k = 3, rounds = 2)
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1) === (4L, 12L)) // clique survives: 4 nodes, 12 arcs
    assert(r(2) === (4L, 12L)) // fixpoint
  }

  test("Versioned.diff classifies inserts, updates, and deletes") {
    val dir = java.nio.file.Files.createTempDirectory("vdiff_").toString + "/t"
    try {
      graft.operators.Versioned.commit(dir,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
      graft.operators.Versioned.commit(dir,
        Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")) // 3 gone, 2 changed, 4 new
      val d = graft.operators.Versioned.diff(spark, dir, 0L, 1L, "k")
        .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
      assert(d === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("transitionMatrix counts adjacencies with deterministic tie-break") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"), (1L, ts(2), 12L, "c"), // b,c tie on ts
      (2L, ts(1), 20L, "a"), (2L, ts(2), 21L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val m = graft.operators.Sequence.transitionMatrix(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("madOutliers: exact integer medians, outliers only past k*MAD") {
    // group g: values 1..9 plus a 100.0 spike -> median 5.5 (med2=11),
    // deviations d2 = |2v-11| = {9,7,5,3,1,1,3,5,7,189}, sorted median
    // of d2 = 5 -> mad4 = 10 (MAD 2.5); only the spike exceeds 5*MAD
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 100.0))
      .toDF("grp", "v")
    val r = graft.operators.Sequence.madOutliers(df, "grp", "v", k = 5).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Int]("n") === 10)
    assert(row.getAs[Long]("med2") === 11000000L)
    assert(row.getAs[Long]("mad4") === 10000000L)
    assert(row.getAs[Int]("n_outliers") === 1)
  }

  test("effectiveDatedJoin picks the version in effect at fact time") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val changes = Seq(
      (1L, ts(10), 100L, "v1"), (1L, ts(30), 101L, "v2") // two versions
    ).toDF("user_id", "ts", "dim_id", "v")
    val facts = Seq(
      (1L, ts(5), 900L),   // before first version: drops
      (1L, ts(20), 901L),  // inside [10, 30): v1
      (1L, ts(30), 902L),  // boundary: half-open -> v2
      (1L, ts(40), 903L)   // open-ended tail: v2
    ).toDF("user_id", "p_ts", "p_id")
    val j = graft.operators.Sequence.effectiveDatedJoin(
        changes, facts, "user_id", "ts", "p_ts", "dim_id")
      .collect().map(r => r.getAs[Long]("p_id") -> r.getAs[Long]("dim_id")).toMap
    assert(j === Map(901L -> 100L, 902L -> 101L, 903L -> 101L))
  }

  test("lastTouchAttribution picks the latest in-window touch with tie-break") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(10), 100L, "click"), (1L, ts(20), 101L, "click"),
      (1L, ts(20), 102L, "click"),               // tie with 101 — higher id wins
      (1L, ts(30), 103L, "purchase"),            // attributed to 102
      (2L, ts(1), 200L, "click"), (2L, ts(55), 201L, "purchase"), // 54 min gap: in 1h window
      (3L, ts(30), 300L, "purchase")             // no click: unattributed
    ).toDF("user_id", "ts", "event_id", "event_type")
    val a = graft.operators.Sequence.lastTouchAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", "click", 3600)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[Long]("touch_id"), r.getAs[Long]("gap_micros"))).toMap
    assert(a === Map(103L -> (102L, 600000000L), 201L -> (200L, 3240000000L)))
  }

  test("containmentPairs finds the contained excerpt Jaccard would miss") {
    // doc 1 is a verbatim excerpt of doc 0 (first 6 of 14 tokens):
    // containment = 1.0 while Jaccard ~ 4/12
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated words over here now with nothing shared at all")
    ).toDF("doc_id", "text")
    val p = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text").collect()
    assert(p.length === 1)
    val r = p.head
    assert(r.getLong(0) === 0L && r.getLong(1) === 1L)
    assert(r.getAs[Int]("n_inter") === 4 && r.getAs[Int]("nb") === 4)
    assert(r.getAs[Long]("containment_micro") === 1000000L)
  }

  test("pmiPairs surfaces the always-co-occurring pair with exact counts") {
    // 'alpha beta' co-occur in all 6 docs; filler tokens vary.
    val docs = (0 until 6).map(i => (i.toLong, s"alpha beta filler$i common"))
      .toDF("doc_id", "text")
    val top = Curation.pmiPairs(docs, "doc_id", "text",
      minDf = 2, minPair = 2, maxTokensPerDoc = 16, k = 5).collect()
    val ab = top.find(r => r.getString(0) == "alpha" && r.getString(1) == "beta")
    assert(ab.isDefined)
    assert(ab.get.getAs[Int]("npair") === 6)
    assert(ab.get.getAs[Int]("na") === 6 && ab.get.getAs[Int]("nb") === 6)
    // lift = 6*6*1e6 div 36 = 1e6 (independence baseline for a sure pair)
    assert(ab.get.getAs[Long]("lift_micro") === 1000000L)
  }

  test("weightedPrioritySample is deterministic and weight-sensitive") {
    val df = (0 until 200).map(i => (i.toLong, if (i < 20) 1000000L else 1L))
      .toDF("id", "w0")
    val s1 = Curation.weightedPrioritySample(df, "id", col("w0"), 20)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val s2 = Curation.weightedPrioritySample(df, "id", col("w0"), 20)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    // the 20 heavy rows (1e6x weight) should dominate the sample
    assert(s1.count(_ < 20L) >= 18)
  }

  test("shardAssign routes every row to [0, n) deterministically; writeTrainShards round-trips") {
    val docs = (0 until 100).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val a = Curation.shardAssign(docs, "doc_id", 8)
    val shards = a.select(col("shard")).distinct().collect().map(_.getInt(0)).sorted
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(a.count() === 100L)
    val dir = java.nio.file.Files.createTempDirectory("shards_").toString
    try {
      Curation.writeTrainShards(docs, "doc_id", 8, dir)
      val back = spark.read.parquet(dir)
      assert(back.count() === 100L)
      assert(back.select(col("doc_id")).except(docs.select(col("doc_id"))).count() === 0L)
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length === shards.length)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("gopherRepetition computes exact micro-fractions and flags loops") {
    val docs = Seq(
      (0L, "a b a b a b"),                      // pure loop
      (1L, "one two three four five six seven") // no repetition
    ).toDF("doc_id", "text")
    val r = Curation.gopherRepetition(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 0: 2-grams [ab,ba,ab,ba,ab] n2=5 mx2=3; 3-grams [aba,bab,aba,bab] n3=4 dup3=4
    assert(r(0L).getAs[Long]("top2_micro") === 3L * 1000000L / 5L)
    assert(r(0L).getAs[Long]("dup3_micro") === 1000000L)
    assert(r(0L).getAs[Boolean]("flagged"))
    assert(r(1L).getAs[Long]("top2_micro") === 1000000L / 6L)
    assert(r(1L).getAs[Long]("dup3_micro") === 0L)
    assert(!r(1L).getAs[Boolean]("flagged"))
  }

  test("ccnetBuckets partitions the scored corpus into 3 tertiles") {
    val docs = (0 until 30).map { i =>
      val base = Seq.fill(4)(s"tok${i % 5} word common").mkString(" ")
      (i.toLong, base + s" unique$i")
    }.toDF("doc_id", "text")
    val b = Curation.ccnetBuckets(docs, "doc_id", "text").collect()
    assert(b.map(_.getString(0)).sorted.toSeq === Seq("head", "middle", "tail"))
    assert(b.map(_.getAs[Int]("n_docs")).sum === 30)
    val byName = b.map(r => r.getString(0) -> r).toMap
    // head holds the highest log-probs: its min must be >= middle's max
    assert(byName("head").getAs[Double]("min_lp") >=
      byName("middle").getAs[Double]("max_lp"))
  }

  test("ccnetBucketsByThreshold matches the ntile form up to boundary placement") {
    // distinct per-doc score profiles (varying repetition mix) — the
    // value-vs-rank divergence under TIES is documented, not pinned
    val docs = (0 until 30).map { i =>
      val rep = Seq.fill(i % 7 + 1)(s"tok${i % 5} word").mkString(" ")
      (i.toLong, rep + (0 to i % 11).map(j => s" u${i}_$j").mkString)
    }.toDF("doc_id", "text")
    val lp = Curation.bigramLogProb(docs, "doc_id", "text")
    val nScores = lp.select(col("avg_logprob")).distinct().count()
    assert(nScores >= 25, s"test corpus must have distinct scores, got $nScores")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getAs[Int]("n_docs")).toMap
    val exact = counts(Curation.ccnetBuckets(docs, "doc_id", "text"))
    val thresh = counts(Curation.ccnetBucketsByThreshold(docs, "doc_id", "text"))
    assert(thresh.values.sum === exact.values.sum)
    for (b <- Seq("head", "middle", "tail"))
      assert(math.abs(thresh.getOrElse(b, 0) - exact.getOrElse(b, 0)) <= 1,
        s"$b: thresh=${thresh.get(b)} ntile=${exact.get(b)}")
  }

  test("kmeansInt separates well-separated clusters and conserves rows") {
    // two tight clusters in 4-d space, k=2
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(base, base, base, base).map(_ + i * 1e-4f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.kmeansInt(vecs, k = 2, iters = 2).collect()
    assert(out.map(_.getAs[Int]("n")).sum === 20)
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("n")).toSet === Set(10))
    // checksums land near +4e6 / -4e6 — opposite signs prove separation
    val sums = out.map(_.getAs[Long]("centroid_sum"))
    assert(sums.exists(_ > 3000000L) && sums.exists(_ < -3000000L))
  }

  test("pageRankWeightedInt: uniform weights reduce to the unweighted form") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)).toDF("src", "dst")
    val sym = Graph.symmetrize(pairs).cache()
    val unw = Graph.pageRankInt(sym, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w1 = Graph.pageRankWeightedInt(sym.withColumn("w", lit(7L)), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // EXACT reduction: floor(rank·w / (w·deg)) = floor(rank / deg) for
    // any constant w, so every share, every round, is bit-identical
    assert(w1 === unw)
    graft.GraftCache.releaseAll()
  }

  test("pageRankWeightedInt: mass follows the heavier edge") {
    // star center 0 with leaves 1 (weight 9) and 2 (weight 1): after
    // one superstep the heavy leaf holds ~9x the walked-in mass
    val e = Seq((0L, 1L, 9L), (1L, 0L, 9L), (0L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRankWeightedInt(e, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // shares from 0: 1e6·9/10 = 900000 to node 1, 1e6·1/10 = 100000 to 2
    assert(r(1L) === 150000L + 85L * 900000L / 100L)
    assert(r(2L) === 150000L + 85L * 100000L / 100L)
    graft.GraftCache.releaseAll()
  }

  test("commonNeighbors counts shared rare partners, excludes direct links and hub middles") {
    // path 1-0-2, 1-3-2: nodes 1,2 share partners {0,3}; 0,3 share {1,2};
    // and 1-2 are NOT directly linked, 0-3 neither
    val pairs = Seq((0L, 1L), (0L, 2L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val sym = Graph.symmetrize(pairs)
    val got = Graph.commonNeighbors(sym, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 2L, (0L, 3L) -> 2L))
    // direct-link exclusion: close the 1-2 edge and the pair disappears
    val sym2 = Graph.symmetrize(pairs.unionAll(Seq((1L, 2L)).toDF("src", "dst")))
    val got2 = Graph.commonNeighbors(sym2, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got2.contains((1L, 2L)) && got2.contains((0L, 3L)))
    // rare-partner blocking: a middle above maxMidDegree defines NO
    // similarity (every node here has degree 2, so cap 1 kills all)
    assert(Graph.commonNeighbors(sym, maxMidDegree = 1, minCommon = 1).count() === 0L)
    // a hub middle is excluded but rare middles still count: star hub
    // h connects everyone; only the rare middle 0 links (1,2)
    val hub = Graph.symmetrize(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L),
      (0L, 1L), (0L, 2L)).toDF("src", "dst"))
    val viaRare = Graph.commonNeighbors(hub, maxMidDegree = 3, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // hub 9 (degree 4) is no middle; (1,2) share only rare middle 0
    assert(viaRare.get((1L, 2L)) === Some(1L))
    assert(!viaRare.keySet.exists { case (a, b) => (a, b) == (3L, 4L) })
    graft.GraftCache.releaseAll()
  }

  test("localClustering: exact micro coefficients, null for degree-1 nodes") {
    // triangle 0-1-2 plus pendant 3 hanging off 0
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)).toDF("u", "v")
    val got = Graph.localClustering(e).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // node 0: deg 3, 1 triangle -> 2e6/(3*2); nodes 1,2: deg 2 -> 1e6 (clique)
    assert(got === Map(0L -> Some(2000000L / 6), 1L -> Some(1000000L),
      2L -> Some(1000000L), 3L -> None))
    graft.GraftCache.releaseAll()
  }

  test("adamicAdar: per-mid term is 1e12 div micro-rounded ln(degree)") {
    // mids: 10 (degree 2) and 20 (degree 3) both connect 1 and 2;
    // 20 also reaches 5 — so (1,2) scores both terms, (1,5)/(2,5) one
    val pairs = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (20L, 5L))
      .toDF("src", "dst")
    val sym = Graph.symmetrize(pairs)
    def term(d: Long) = 1000000000000L / Math.round(Math.log(d.toDouble) * 1e6)
    val got = Graph.adamicAdar(sym, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got((1L, 2L)) === term(2) + term(3))
    assert(got((1L, 5L)) === term(3) && got((2L, 5L)) === term(3))
    // direct links are excluded: close (1,2) and the pair disappears
    val sym2 = Graph.symmetrize(pairs.unionAll(Seq((1L, 2L)).toDF("src", "dst")))
    val keys2 = Graph.adamicAdar(sym2, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!keys2.contains((1L, 2L)))
    // hub blocking: cap below 3 removes mid 20's wedges entirely
    val capped = Graph.adamicAdar(sym, maxMidDegree = 2, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // symmetrized mids 1,2 (degree 2 each) also link the pair (10,20)
    assert(capped === Map((1L, 2L) -> term(2), (10L, 20L) -> 2 * term(2)))
    graft.GraftCache.releaseAll()
  }

  test("ssspWeighted: exact weighted distances, refuses non-positive weights") {
    val e = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 10L), (2L, 3L, 2L))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val got = Graph.ssspWeighted(e, seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0->2 goes via 1 (5+1=6 < 10); 3 rides the improved route (6+2)
    assert(got === Map(0L -> 0L, 1L -> 5L, 2L -> 6L, 3L -> 8L))
    val bad = Seq((0L, 1L, 0L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      Graph.ssspWeighted(bad, seeds)
    }
    assert(ex.getMessage.contains("positive"))
    graft.GraftCache.releaseAll()
  }

  test("hashWalks: valid edges, reproducible, refuses dead ends") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L)).toDF("src", "dst")
    val sym = Graph.symmetrize(pairs)
    val seeds = Seq(0L, 1L).toDF("node")
    val edgeSet = sym.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val walks = Graph.hashWalks(sym, seeds, walkLen = 4, walksPerNode = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(walks.length === 2 * 3)
    // every consecutive hop in every path is a real edge
    for ((start, _, path) <- walks) {
      val hops = path.split(">").map(_.toLong)
      assert(hops.head === start && hops.length === 5)
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(edgeSet.contains((a, b)), s"phantom hop $a>$b in $path")
      }
    }
    // pure function of the graph: a second run is bit-identical
    val again = Graph.hashWalks(sym, seeds, walkLen = 4, walksPerNode = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(walks.sorted.toSeq === again.sorted.toSeq)
    // a seed with no out-edges refuses
    val ex = intercept[IllegalArgumentException] {
      Graph.hashWalks(sym, Seq(99L).toDF("node"), 2, 1)
    }
    assert(ex.getMessage.contains("no"))
    // a mid-walk dead end on a DIRECTED chain refuses, never drops
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val ex2 = intercept[IllegalArgumentException] {
      Graph.hashWalks(chain, Seq(0L).toDF("node"), walkLen = 3,
        walksPerNode = 1)
    }
    assert(ex2.getMessage.contains("symmetrize"))
    graft.GraftCache.releaseAll()
  }

  test("Versioned.statsDiff reports per-column drift between snapshots") {
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("sdiff_").toString + "/t"
    try {
      Versioned.commit(dir,
        Seq((1L, "en", 10L), (2L, "es", 20L), (3L, null, 30L))
          .toDF("k", "lang", "n"))
      Versioned.commit(dir,
        Seq((1L, "en", 10L), (2L, "en", 999L), (4L, "de", 5L), (5L, "de", 6L))
          .toDF("k", "lang", "n"))
      val d = Versioned.statsDiff(spark, dir, 0L, 1L, Seq("lang", "n"))
        .collect().map(r => r.getString(0) -> r).toMap
      val lang = d("lang")
      assert(lang.getAs[Long]("rows_from") === 3L && lang.getAs[Long]("rows_to") === 4L)
      assert(lang.getAs[Long]("nulls_from") === 1L && lang.getAs[Long]("nulls_to") === 0L)
      assert(lang.getAs[Long]("distinct_from") === 2L && lang.getAs[Long]("distinct_to") === 2L)
      assert(lang.getAs[String]("min_from") === "en" && lang.getAs[String]("max_to") === "en")
      val n = d("n")
      assert(n.getAs[String]("max_from") === "30" && n.getAs[String]("max_to") === "999")
      assert(n.getAs[Long]("distinct_to") === 4L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }

  // VERDICT r9 item 4: degree is computed on src alone, so an
  // unsymmetrized list silently yields wrong cores — it must REFUSE.
  test("kcorePeel refuses a one-directional edge list") {
    val oneWay = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Sequence.kcorePeel(oneWay, k = 2, rounds = 1)
    }
    assert(ex.getMessage.contains("SYMMETRIZED"))
    // the symmetrized form of the same graph passes
    val ok = graft.operators.Sequence.kcorePeel(Graph.symmetrize(oneWay),
      k = 2, rounds = 1).collect()
    assert(ok.length === 1)
  }

  // VERDICT r9 item 5: peel to convergence, no guessed round count.
  test("kcoreFixpoint matches brute-force peeling and stops at the fixpoint") {
    // K4 + node 4 on {0, 1, 5} + pendant 5: at k=3, round 1 peels only
    // 5 (degree 1; 4 still holds degree 3), round 2 peels 4 (now
    // degree 2), round 3 changes nothing — a genuine cascade where
    // each removal triggers the next.
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (0L, 4L), (1L, 4L), (4L, 5L)).toDF("src", "dst")
    val sym = Graph.symmetrize(pairs)
    val got = graft.operators.Sequence.kcoreFixpoint(sym, k = 3)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    // brute force on the driver
    var es = sym.as[(Long, Long)].collect().toSet
    var want = Vector((0, es.map(_._1).size.toLong, es.size.toLong))
    var r = 1
    var advancing = true
    while (advancing) {
      val deg = es.groupBy(_._1).map { case (n, g) => n -> g.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val ns = es.filter(e => keep(e._1) && keep(e._2))
      if (ns.size == es.size || ns.isEmpty) advancing = false
      else { want :+= ((r, ns.map(_._1).size.toLong, ns.size.toLong)); es = ns; r += 1 }
    }
    assert(got.toVector === want)
    assert(got.head._1 === 0 && got.length >= 3) // round 0 + >= 2 peel rounds
    // an already-k-core input converges immediately: only round 0
    val clique = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val stable = graft.operators.Sequence.kcoreFixpoint(Graph.symmetrize(clique), k = 3)
      .collect()
    assert(stable.length === 1 && stable.head.getInt(0) === 0)
    // a graph whose core is EMPTY emits only the non-empty rounds
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gone = graft.operators.Sequence.kcoreFixpoint(Graph.symmetrize(path), k = 2)
      .collect().map(_.getInt(0)).sorted
    // path: round 0 (input), round 1 peels endpoints -> 1-2 edge
    // survives with degree 1 each, round 2 empties -> not emitted
    assert(gone.head === 0 && gone.forall(_ <= 1))
    graft.GraftCache.releaseAll()
  }

  // VERDICT r9 item 3: reliable checkpointing for the remaining
  // iterative ops — same contract as connectedComponents' option.
  test("pageRankInt and bfsLevels with a reliable checkpoint dir match local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-it-ckpt").toString
    try {
      val rnd = new scala.util.Random(11)
      val pairs = (0 until 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2).toDF("src", "dst")
      val sym = Graph.symmetrize(pairs).cache()
      // checkpointEvery=2 so the 5-iteration run actually cuts lineage
      val prLocal = Graph.pageRankInt(sym, iters = 5, checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prDurable = Graph.pageRankInt(sym, iters = 5, checkpointEvery = 2,
          checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prDurable === prLocal)
      val seeds = Seq(Tuple1(0L)).toDF("node")
      val bfsLocal = Graph.bfsLevels(sym, seeds, maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val bfsDurable = Graph.bfsLevels(sym, seeds, maxHops = 4,
          checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(bfsDurable === bfsLocal)
      // the reliable mode actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable mode should persist checkpoint files")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      graft.GraftCache.releaseAll()
    }
  }
}
