package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames.
  *
  * The reference has no graph surface (its closest shape is the
  * hand-rolled join pipelines, `/root/reference/dampr/dampr.py:768`),
  * but a corpus-curation engine needs one: link-graph ranking for
  * crawl prioritization and authority-weighted dedup both reduce to
  * PageRank over an edge list. The implementation is the standard
  * Pregel decomposition — each superstep is one keyed join
  * (ranks ⋈ edges on src) plus one aggregation (sum of contributions
  * by dst) — expressed as DataFrame ops so Catalyst plans both as
  * hash shuffles on the node key and AQE handles hub skew.
  *
  * All mass arithmetic is INTEGER (micro-units): floating-point
  * PageRank sums neighbor contributions in engine- and
  * partition-dependent order, so no rounding discipline can make a
  * double-based rank hash-stable across engines. Integer mass
  * (`initMass` µ per node, truncating division for the out-share and
  * the damping factor) is order-free and exact — the same micro-unit
  * trick as [[Curation.bigramLogProb]]'s log-probs.
  */
object Graph {

  /** Integer-mass PageRank over a SYMMETRIZED edge list.
    *
    * `edges` must contain both directions of every link (use
    * [[symmetrize]]) so every node has outdeg ≥ 1 — dangling-mass
    * redistribution would otherwise need a global scalar per
    * iteration, which is exactly the kind of driver synchronization
    * this formulation avoids.
    *
    * Per iteration: contribution of node u to each out-neighbor is
    * `rank(u) div outdeg(u)` (truncating; the remainder mass is
    * deliberately dropped — identically in any engine), and
    * `rank'(v) = initMass·(den−num)/den + (num · Σ contribs) div den`
    * with damping `num/den` (default 85/100).
    *
    * Scale: the degree table is computed once and joined into the
    * rank frame, so each superstep shuffles (a) the rank frame by
    * node and (b) the contribution stream by dst — both keyed hash
    * shuffles with map-side partial sums on (b). The edge frame is
    * cached HASH-PARTITIONED BY src, so (a) reuses the cache's layout
    * every superstep and only the node-sized rank frame moves — the
    * x1000 soak measured the difference as the whole ballgame: the
    * unpartitioned cache re-shuffled ~1.2B edge rows per superstep
    * (~20 GB of shuffle files each), and with checkpointEvery = 5 a
    * 3-superstep run never pinned, so every superstep's files stayed
    * retained at once: 59 GB of spill before the run was killed at
    * 96% disk. Lineage is therefore cut EVERY superstep by default
    * ([[Iterative.pin]] — eager localCheckpoint, reliable
    * `.checkpoint()` into `checkpointDir` for preemption-survivable
    * cluster runs): the pin is semantics-free and node-frame cheap,
    * and it makes each superstep's shuffle files collectible as soon
    * as the next one is pinned, bounding retained spill to ~one
    * superstep regardless of depth.
    */
  def pageRankInt(edges: DataFrame, iters: Int,
      initMass: Long = 1000000L, dampNum: Int = 85, dampDen: Int = 100,
      checkpointEvery: Int = 1, checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val pin = Iterative.pin(edges.sparkSession, checkpointDir)
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).repartition(col("src")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var ranks = deg.select(col("src").as("node"), lit(initMass).as("rank"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.join(deg, ranks("node") === deg("src"))
          .select(col("node"), expr("rank div outdeg").as("share")),
          e("src") === col("node"))
        .select(col("dst").as("node"), col("share"))
      ranks = contrib.groupBy(col("node"))
        .agg(sum(col("share")).as("in_mass"))
        .select(col("node"),
          (lit(baseMass) + expr(s"($dampNum * in_mass) div $dampDen")).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = pin(ranks)
    }
    ranks
  }

  /** Weighted integer-mass PageRank: [[pageRankInt]] where node u's
    * contribution to neighbor v is `rank(u)·w(u,v) div W(u)` with
    * `W(u) = Σ_v w(u,v)` — edge strength (trade volume, link count,
    * co-occurrence weight) steers the mass instead of splitting it
    * evenly. `edges` must be symmetrized with positive integer
    * weights (weights symmetric per undirected link). Same Pregel
    * shape and shuffle profile as the unweighted form: the weighted
    * degree joins in once, each superstep is one keyed join + one
    * map-side-combined sum.
    *
    * Integer bound (documented, not checked — it is corpus math, not
    * row math): `rank·w` must stay below 2^63. Total injected mass is
    * `n_nodes·initMass`, so at 1e9 nodes with the default 1e6 µ and
    * weights up to ~1e3 the worst-case product sits near 1e18 — pick
    * a smaller `initMass` for larger graphs or heavier weights.
    */
  def pageRankWeightedInt(edges: DataFrame, iters: Int,
      initMass: Long = 1000000L, dampNum: Int = 85, dampDen: Int = 100,
      checkpointEvery: Int = 1, checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val pin = Iterative.pin(edges.sparkSession, checkpointDir)
    // src-partitioned cache + per-superstep pin: see [[pageRankInt]]
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
        .repartition(col("src")))
    val wdeg = e.groupBy(col("src")).agg(sum(col("w")).as("ws"))
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var ranks = wdeg.select(col("src").as("node"), lit(initMass).as("rank"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.join(wdeg, ranks("node") === wdeg("src"))
          .select(col("node"), col("rank"), col("ws")),
          e("src") === col("node"))
        .select(col("dst").as("node"), expr("(rank * w) div ws").as("share"))
      ranks = contrib.groupBy(col("node"))
        .agg(sum(col("share")).as("in_mass"))
        .select(col("node"),
          (lit(baseMass) + expr(s"($dampNum * in_mass) div $dampDen")).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = pin(ranks)
    }
    ranks
  }

  /** Common-RARE-neighbor counts between nodes at graph distance 2 —
    * the link-prediction / similar-entity primitive ("customers
    * sharing suppliers"). One wedge self-join keyed on the MIDDLE
    * node, minus the directly-connected pairs (left-anti on the edge
    * list), canonical `u < v`.
    *
    * Scale discipline: only middles with degree <= `maxMidDegree`
    * define similarity. This is the idf insight (a partner shared by
    * EVERYONE carries no signal — the same rare-shingle blocking as
    * [[Dedup]]'s containment pairs) AND the scale bound: raw wedge
    * volume is Σ deg(m)² — measured 371M wedges / 83M pairs on the
    * sf0.1 trade graph, quadratic-in-hub-degree at 100 TB — while the
    * capped volume is <= maxMidDegree · Σ deg(m), LINEAR in the edge
    * count for a fixed cap (sf0.1 at cap 20: 120K pairs, 0.2 s).
    * Both join legs are keyed hash joins; the degree frame semi-joins
    * in before the wedge.
    */
  def commonNeighbors(edges: DataFrame, maxMidDegree: Int = 64,
      minCommon: Int = 2): DataFrame = {
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    val rare = e.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxMidDegree).select(col("src"))
    val em = e.join(rare, "src")
    // wedge (a -m- b), a < b, counted per rare middle m; m ranges over
    // the middle node's OUT view which, symmetrized, is its neighbors
    em.select(col("src").as("m"), col("dst").as("a")).as("l")
      .join(em.select(col("src").as("m"), col("dst").as("b")).as("r"), "m")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      // drop pairs already directly linked — prediction wants NEW links
      .join(e.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_anti")
  }

  /** Both directions of each distinct undirected link. The canonical
    * frame feeds both union legs, so it persists through the call
    * (released with [[graft.GraftCache.releaseAll]]).
    */
  def symmetrize(pairs: DataFrame): DataFrame = {
    val p = graft.GraftCache.registered(
      pairs.select(col("src"), col("dst")).distinct())
    p.union(p.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** Per-node degree of a symmetrized edge list — the cheap
    * "is this node a hub" diagnostic that decides salting.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))

  /** Personalized PageRank (random walk with restart) — same integer
    * machinery as [[pageRankInt]], but all teleport mass returns to
    * the `seeds` node set instead of spreading uniformly: the
    * "entities related to X" recommendation primitive. Seeds ride a
    * broadcast semi-join (seed sets are query-sized); non-seed nodes
    * receive only walked-in mass. Initial mass: `initMass` on each
    * seed, 0 elsewhere.
    */
  def personalizedPageRankInt(edges: DataFrame, seeds: DataFrame, iters: Int,
      initMass: Long = 1000000L, dampNum: Int = 85, dampDen: Int = 100,
      checkpointEvery: Int = 1, checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val pin = Iterative.pin(edges.sparkSession, checkpointDir)
    // src-partitioned cache + per-superstep pin: see [[pageRankInt]]
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).repartition(col("src")))
    val sd = broadcast(seeds.select(col("node").cast("long").as("node")).distinct())
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var ranks = deg.select(col("src").as("node"))
      .join(sd.withColumn("seed", lit(1)), Seq("node"), "left_outer")
      .select(col("node"),
        when(col("seed").isNotNull, lit(initMass)).otherwise(lit(0L)).as("rank"))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.join(deg, ranks("node") === deg("src"))
          .select(col("node"), expr("rank div outdeg").as("share")),
          e("src") === col("node"))
        .select(col("dst").as("node"), col("share"))
      val walked = contrib.groupBy(col("node"))
        .agg(sum(col("share")).as("in_mass"))
        .select(col("node"), expr(s"($dampNum * in_mass) div $dampDen").as("walked"))
      ranks = walked
        .join(sd.withColumn("seed", lit(1)), Seq("node"), "left_outer")
        .select(col("node"),
          (col("walked") +
            when(col("seed").isNotNull, lit(baseMass)).otherwise(lit(0L))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = pin(ranks)
    }
    ranks.filter(col("rank") > 0)
  }

  /** Same-side projection of a bipartite incidence list: an edge
    * between two right-side entities for every left-side key they
    * share (suppliers sharing a customer, docs sharing a shingle...).
    * Output is canonical (`u < v`), distinct.
    *
    * Scale: the self-join is keyed by the left column — co-located,
    * never global — but per-key cost is quadratic in that key's
    * right-degree, exactly like the LSH bucket joins, so the same
    * bucket-size guard applies: keys whose right-degree exceeds
    * `maxPerKey` are REJECTED with the count, forcing the caller to
    * cap or sample hot keys rather than silently going quadratic
    * (the [[Dedup.requireBoundedBlocks]] posture).
    */
  def projectBipartite(pairs: DataFrame, leftCol: String, rightCol: String,
      maxPerKey: Int = 10000): DataFrame = {
    val p = pairs.select(col(leftCol).as("k"), col(rightCol).cast("long").as("s"))
      .distinct()
    val hot = p.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxPerKey).limit(1).collect()
    require(hot.isEmpty,
      s"projectBipartite: key ${hot.headOption.map(_.get(0))} has right-degree " +
      s"${hot.headOption.map(_.get(1))} > maxPerKey=$maxPerKey; cap or sample hot keys first")
    p.as("a").join(p.as("b"),
        col("a.k") === col("b.k") && col("a.s") < col("b.s"))
      .select(col("a.s").as("u"), col("b.s").as("v")).distinct()
  }

  /** BFS hop levels from a seed set over a symmetrized edge list:
    * `(node, dist)` for every node within `maxHops`, dist = length of
    * the shortest path to any seed. Each round expands the frontier
    * through one keyed join and subtracts already-visited nodes with
    * a left-anti join — the textbook iterative-frontier shape whose
    * per-round cost tracks the FRONTIER, not the graph. The fixed
    * edge frame is cached `repartition(src)` so every hop's expansion
    * join reuses the cache's HashPartitioning — only the frontier
    * moves per hop (the pageRank-family lesson: an unpartitioned
    * cache re-exchanged the full edge set every round). Lineage is
    * cut per round ([[Iterative.pin]]; visited feeds every later
    * round), reliably into `checkpointDir` when given.
    */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val pin = Iterative.pin(edges.sparkSession, checkpointDir)
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).repartition(col("src")))
    var visited = pin(seeds.select(col("node").cast("long").as("node"),
      lit(0).as("dist")).distinct())
    var frontier = visited.select(col("node"))
    for (h <- 1 to maxHops) {
      frontier = pin(e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti"))
      visited = pin(visited.union(frontier.select(col("node"), lit(h).as("dist"))))
    }
    visited
  }

  /** Log2-bucketed degree histogram of a symmetrized edge list — the
    * one-aggregate skew diagnostic read before choosing salting /
    * hub-capping parameters.
    */
  def degreeHistogram(edges: DataFrame): DataFrame =
    degrees(edges)
      // floor(log2) via binary-digit count: Spark's LOG2 lowers to
      // log(x)/log(2), whose double quotient can sit a ulp either
      // side of an integer at exact powers of two — the bin() length
      // is integer-exact in every engine
      .select((length(bin(col("degree"))) - 1).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as("n_nodes"))

  /** Local clustering coefficient per node over a canonical
    * (`u < v`, distinct) undirected edge list:
    * `cc = 2·tri(v) / (deg(v)·(deg(v)−1))` in exact micro-units —
    * how close each node's neighborhood is to a clique, the
    * per-node community-density / spam-farm signal that global
    * triangle counts ([[triangleCounts]]) average away.
    *
    * Scale: one degree aggregate over the edge list (each canonical
    * edge credits both endpoints) + the [[triangleCounts]] wedge
    * join — the wedge is the dominant term and carries the same
    * Σ deg² bound and hot-node-capping posture. The division is
    * integer (`2e6·tri div deg·(deg−1)`), order-free and
    * engine-exact; degree-1 nodes (undefined coefficient) return
    * null rather than a fake 0.
    */
  def localClustering(canonEdges: DataFrame): DataFrame = {
    val e = graft.GraftCache.registered(
      canonEdges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v")).distinct())
    // registered: the degree frame feeds both the quotient below AND
    // triangleCounts' skew probe/orientation (passed via knownDegrees
    // so the aggregate runs once, not once per consumer)
    val deg = graft.GraftCache.registered(
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree")))
    deg.join(triangleCounts(e,
        knownDegrees = Some(deg.select(col("node"), col("degree").as("deg")))),
        Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_micro",
        when(col("degree") >= 2,
          expr("(n_tri * 2000000) div (degree * (degree - 1))")))
  }

  /** Adamic-Adar link prediction over a SYMMETRIZED edge list:
    * [[commonNeighbors]] where each shared partner m contributes
    * `1/ln(deg(m))` instead of 1 — rarer partners carry more signal,
    * the graph form of idf. Integer discipline: the one transcendental
    * is micro-rounded ONCE per distinct degree
    * (`ln_micro = round(ln(d)·1e6)`), the per-mid term is the exact
    * integer division `1e12 div ln_micro`, and pair scores are
    * order-free integer sums — hash-stable across engines.
    *
    * Same linear wedge bound as [[commonNeighbors]]: only mids with
    * `2 <= deg <= maxMidDegree` define similarity (degree-1 nodes
    * cannot form a wedge; `ln(1) = 0` would divide by zero — the
    * floor is structural, not a guard), so wedge volume is
    * `<= maxMidDegree · Σ deg(m)`, linear in edges for a fixed cap.
    */
  def adamicAdar(edges: DataFrame, maxMidDegree: Int = 64,
      minCommon: Int = 2): DataFrame = {
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    val mids = e.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("n") <= maxMidDegree)
      .select(col("src").as("m"),
        expr("1000000000000 div cast(round(ln(n) * 1000000) as bigint)")
          .as("term_micro"))
    val em = e.join(mids, e("src") === mids("m"))
      .select(col("m"), col("dst"), col("term_micro"))
    em.select(col("m"), col("dst").as("a"), col("term_micro")).as("l")
      .join(em.select(col("m"), col("dst").as("b")).as("r"), "m")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"), sum(col("term_micro")).as("aa_micro"))
      .filter(col("n_common") >= minCommon)
      .join(e.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_anti")
  }

  /** Single-source shortest paths with strictly positive integer edge
    * weights over a symmetrized weighted edge list (`src, dst, w`) —
    * the weighted generalization of [[bfsLevels]]. Frontier-driven
    * Bellman-Ford: each round relaxes only edges out of nodes whose
    * distance IMPROVED last round, so per-round cost tracks the
    * frontier, not the graph; convergence is exact (no frontier node
    * improved — with positive weights that is the fixpoint, reached
    * within the max edge-count of any shortest path). Distances are
    * exact integer weight sums, order-free under the min-merge.
    *
    * Non-positive weights are REFUSED (one bounded scan): zero-weight
    * cycles would make "no improvement" unreachable and negative
    * weights break the frontier invariant — the caller should shift
    * the weight scale instead.
    */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val pin = Iterative.pin(edges.sparkSession, checkpointDir)
    // fixed edge frame, joined on src every relaxation round: cache it
    // src-partitioned so each round reuses the layout and only the
    // frontier shuffles (the pageRank-family lesson)
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
        .repartition(col("src")))
    val bad = e.filter(col("w") <= 0).limit(1).collect()
    require(bad.isEmpty,
      s"ssspWeighted requires strictly positive integer weights; found w=" +
        s"${bad.headOption.map(_.get(2))} — shift/rescale the weight column first")
    var dist = pin(seeds.select(col("node").cast("long").as("node"),
      lit(0L).as("dist")).distinct())
    var frontier = dist
    var r = 0
    var n = frontier.count()
    while (n > 0) {
      r += 1
      if (r > maxRounds) throw new IllegalStateException(
        s"ssspWeighted did not settle within maxRounds=$maxRounds rounds; " +
          "the bound is the max edge-count of any shortest path — raise maxRounds")
      val cand = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val improved = pin(cand.join(dist, Seq("node"), "left_outer")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("node"), col("nd").as("dist")))
      n = improved.count()
      if (n > 0) {
        // frontier-sized merge: `improved` rows strictly beat (or are
        // absent from) `dist` by construction, so an anti-join + union
        // replaces them without re-aggregating the FULL distance frame
        // — the settled mass streams through while only the frontier
        // shuffles (broadcast-able under AQE), keeping per-round cost
        // on the frontier as the scaladoc promises
        dist = pin(dist.join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionAll(improved))
        frontier = improved
      }
    }
    dist
  }

  /** The wedge-join skew lever: re-orient a canonical (`u < v`,
    * distinct) undirected edge list so each edge points from its
    * (degree, id)-SMALLER endpoint to its larger one. Relabeling ids
    * by degree rank and re-canonicalizing `lo < hi` produces exactly
    * this orientation (rank is monotone in (degree, id)), so the
    * orientation IS the relabel's entire effect on a wedge join —
    * and it keeps the original node ids, needing no translate-back.
    *
    * Why it kills the hub problem: a wedge join generates, per mid
    * node, out-degree² candidate pairs. Under id order a hub's mid
    * fan-out is its full degree (deg² wedges in one task); under
    * degree order a node's out-neighbors all have HIGHER (degree,
    * id), and a standard argument bounds that out-degree by
    * O(√(2·|E|)) — total wedge volume falls from Σ deg² to
    * O(|E|^1.5) with no single-task hub blowup. Any triangle
    * `x ≺ y ≺ z` is still found exactly once: edges orient to
    * (x,y), (y,z), (x,z) under any strict total order ≺.
    *
    * Cost: one degree aggregate + two endpoint joins — linear,
    * shuffle-keyed on node ids. [[triangleCounts]] (and so
    * [[localClustering]]) applies it internally by default.
    */
  def degreeRelabel(canonEdges: DataFrame): DataFrame = {
    val e0 = canonEdges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    orientWith(e0, degreesOf(e0))
  }

  /** Per-node degree of a canonical edge list (each edge credits both
    * endpoints) — one map-side-combined aggregate. */
  private def degreesOf(e0: DataFrame): DataFrame =
    e0.select(col("u").as("node")).unionAll(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** [[degreeRelabel]] with the degree frame supplied by the caller
    * (so an adaptive caller can probe it first without recomputing). */
  private def orientWith(e0: DataFrame, deg: DataFrame): DataFrame = {
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    e0.join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"))
      .select(col("lo").as("u"), col("hi").as("v"))
  }

  /** Per-node triangle counts over a canonical (`u < v`, distinct)
    * undirected edge list: the local clustering signal (community
    * density, spam-farm detection). Each triangle `a ≺ b ≺ c` is
    * found exactly once by joining wedge `(a,b)+(b,c)` against the
    * closing edge `(a,c)`, then credited to all three corners.
    *
    * Scale: two shuffle joins keyed on node ids, with the
    * [[degreeRelabel]] skew lever applied ADAPTIVELY: a 1-row probe
    * of the degree frame (`maxDeg² > 8·|E|` — one hub alone would
    * enumerate 8× the edge count in wedges) decides whether the two
    * orientation joins are worth paying. Flat graphs skip them
    * (measured: the always-on orientation cost q142 ~2× at sf0.1 for
    * zero benefit); power-law graphs get the O(|E|^1.5) wedge bound
    * with no deg² hub mid. Orientation changes which wedges are
    * ENUMERATED, never which triangles close — counts are
    * orientation-invariant. `orientByDegree = false` pins the naive
    * id orientation (no probe, no degree pass). `knownDegrees`
    * (node, deg) lets a caller that already aggregated degrees (e.g.
    * [[localClustering]]) feed the probe for free.
    */
  def triangleCounts(canonEdges: DataFrame,
      orientByDegree: Boolean = true,
      knownDegrees: Option[DataFrame] = None): DataFrame = {
    // the edge frame feeds THREE join legs (and under orientation the
    // degree agg + two endpoint joins read it again) — without a
    // persist the upstream pipeline (often an LSH candidate generator)
    // would execute once per read (measured: q142 8.6s → 2.9s at
    // sf0.1; an uncached orientation input costs 2× again)
    val raw = graft.GraftCache.registered(
      canonEdges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v")))
    val e =
      if (orientByDegree) {
        val deg = knownDegrees.getOrElse(
          graft.GraftCache.registered(degreesOf(raw)))
        // skew probe: 1-row aggregate, bounded driver artifact
        val st = deg.agg(coalesce(max(col("deg")), lit(0L)).as("mx"),
          coalesce(sum(col("deg")), lit(0L)).as("d2")).collect().head
        val mx = st.getLong(0).toDouble
        val m = st.getLong(1).toDouble / 2
        if (mx * mx > 8 * m) graft.GraftCache.registered(orientWith(raw, deg))
        else raw
      } else raw
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Deterministic uniform random walks — the DeepWalk/node2vec
    * (p = q = 1) training-data generator, with the RNG replaced by
    * the engine-shared md5 hash: step i of walk (start, w) moves to
    * neighbor number `md5_32("walk_<start>_<w>_<i>_<cur>") mod
    * deg(cur)` in the dst-sorted adjacency. The whole corpus of walks
    * is a pure function of the graph — reproducible across runs,
    * engines and cluster sizes, replayable by the DuckDB oracle, and
    * exactly what you want when the walks feed an embedding trainer
    * that must be re-run bit-identically.
    *
    * Scale: the adjacency indexes ONCE (row_number per src — one
    * sort shuffle); each step is two O(1)-match keyed joins (degree
    * lookup, then equi-join on BOTH (src, idx) so a hub's fan-out is
    * never materialized), with the per-round lineage cut. State is
    * seeds x walksPerNode rows regardless of graph size. Walks from a
    * node with no out-edges are REFUSED (symmetrize first) — silently
    * stopping short would bias the window corpus.
    */
  def hashWalks(edges: DataFrame, seeds: DataFrame, walkLen: Int,
      walksPerNode: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(walkLen >= 1 && walksPerNode >= 1,
      s"hashWalks: walkLen/walksPerNode must be >= 1, got $walkLen/$walksPerNode")
    val spark = edges.sparkSession
    val pin = Iterative.pin(spark, checkpointDir)
    val e = graft.GraftCache.registered(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct())
    import org.apache.spark.sql.expressions.Window
    val adj = graft.GraftCache.registered(
      e.withColumn("idx", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("dst"))) - 1))
    val deg = graft.GraftCache.registered(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("dnode"), col("deg")))
    val spine = broadcast(
      spark.range(walksPerNode).select(col("id").cast("long").as("w")))
    var state = pin(seeds.select(col("node").cast("long").as("start")).distinct()
      .join(deg, col("start") === col("dnode"), "left_outer")
      .select(col("start"), col("deg").isNotNull.as("ok"))
      .crossJoin(spine)
      .select(col("start"), col("w"), col("ok"),
        col("start").as("cur"), col("start").cast("string").as("path")))
    val stranded = state.filter(!col("ok")).select(col("start")).limit(1).collect()
    require(stranded.isEmpty,
      s"hashWalks: seed ${stranded.headOption.map(_.getLong(0))} has no " +
        "out-edges — walk on the symmetrized graph or drop isolated seeds")
    state = state.drop("ok")
    val stateCount0 = state.count()
    for (i <- 1 to walkLen) {
      val h = graft.plans.Md5Prefix32.md5prefix32(concat_ws("_",
        lit("walk"), col("start"), col("w"), lit(i), col("cur")))
      val step = state
        .join(deg, state("cur") === deg("dnode"))
        .withColumn("nidx", pmod(h, col("deg")))
        .join(adj.as("adj"),
          col("cur") === col("adj.src") && col("nidx") === col("adj.idx"))
        .select(col("start"), col("w"), col("adj.dst").as("cur"),
          concat(col("path"), lit(">"),
            col("adj.dst").cast("string")).as("path"))
      state = pin(step)
      // a mid-walk dead end (possible only on a non-symmetrized graph)
      // would silently DROP the walk at the inner join and bias the
      // corpus — refuse instead, same posture as the seed check
      if (i == walkLen) {
        val expect = stateCount0
        val got = state.count()
        require(got == expect,
          s"hashWalks: $got of $expect walks survived — a walk hit a " +
            "node with no out-edges mid-path; symmetrize the graph first")
      }
    }
    state.select(col("start"), col("w"), col("cur").as("end_node"), col("path"))
  }
}
