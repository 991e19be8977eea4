package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): frequency
  * estimation in O(d·w) state regardless of corpus size — the
  * fixed-memory alternative to an exact item→count table when the key
  * space is unbounded (token vocabularies, URLs, n-grams at 100 TB).
  *
  * The sketch is a d×w counter grid; item x increments cell
  * (r, h_r(x) mod w) for each of the d hash rows, and the estimate is
  * the MIN over the d cells — always >= the true count, and within
  * εN of it (ε = e/w) with probability 1 − e^{−d}.
  *
  * Spark shape: the build is ONE hash aggregation keyed on (row,
  * bucket). Because the grid has at most d·w distinct keys, map-side
  * partial aggregation collapses every partition to <= d·w cells
  * before the shuffle — kilobytes per partition at any corpus size,
  * where the exact count (q84's shape) must shuffle every distinct
  * key. Sketches built over different corpus slices merge by cell-wise
  * sum ([[countMinMerge]]), the same union-then-sum shape HLL merging
  * uses.
  *
  * Hashing is the repo-wide md5-derived h31 over a row-tagged key
  * ("cm<r>_" prefix), so every cell — and therefore every estimate —
  * replays exactly in the DuckDB oracle (no probabilistic slack needed
  * in grading; the CONTRACT est >= exact is additionally pinned in
  * OperatorsSpec).
  */
object Sketch {

  /** Bucket of `key` in hash row `r`: h31("cm<r>_" + key) mod w. */
  private def bucket(key: org.apache.spark.sql.Column, r: Int, w: Int) =
    pmod(graft.functions.TextFunctions.h31(concat(lit(s"cm${r}_"), key)), lit(w))

  /** Build the d×w sketch over one string key column: one aggregation,
    * output <= d·w rows of (r, bucket, cnt).
    */
  def countMinSketch(items: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    val rows = array((0 until d).map(r =>
      struct(lit(r).as("r"), bucket(col(keyCol), r, w).as("bucket"))): _*)
    items.select(explode(rows).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the count of each distinct key in `keys`: min over
    * the d row cells. The sketch side is <= d·w rows — broadcast by
    * AQE — so the probe never reshuffles the key frame. Keys never
    * inserted estimate as 0 (their cells may be absent).
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame = {
    val probes = keys.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(col("key"), r, w).as("bucket"))): _*)).as("cell"))
      .select(col("key"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
    probes.join(sketch, Seq("r", "bucket"), "left_outer")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge sketches built over disjoint corpus slices: cell-wise sum.
    * Estimates over the merged sketch bound the union's true counts
    * exactly as a single-pass sketch over the whole corpus would.
    */
  def countMinMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Two-pass heavy hitters ("every key with count >= threshold"):
    * pass 1 builds the sketch; the d×w grid (<= a few KB) is collected
    * to the driver and folded into LITERAL arrays, so pass 2's
    * per-row estimate `min_r grid[r][h_r(key)]` is a pure codegen
    * expression evaluated MAP-SIDE — the exact-count shuffle then
    * carries only rows of candidate keys. CMS never undercounts, so
    * the prefilter has NO false negatives (the result is exactly the
    * true heavy hitters); overcounted light keys are dropped by the
    * exact recount.
    *
    * This is the 100 TB shape for frequency thresholds over unbounded
    * key spaces: the first pass shuffles <= d·w cells, and the second
    * shuffles only the heavy candidates' rows — never the full
    * vocabulary. Returns (key, est, cnt), est being the sketch bound
    * (>= cnt).
    */
  /** φ-heavy hitters, the standard relative formulation: keys with
    * count >= ceil(φ·N) for φ = phiNum/phiDen (kept rational so the
    * threshold is INTEGER-exact and replays in SQL as
    * `(phiNum·N + phiDen − 1) // phiDen`). A static absolute threshold
    * stops meaning anything as the corpus grows — at the 1000× soak
    * tier every token cleared a fixed 900 and the prefilter passed
    * everything; φN tracks the corpus.
    */
  def heavyHittersFrac(items: DataFrame, keyCol: String, phiNum: Long, phiDen: Long,
      d: Int, w: Int): DataFrame = {
    // N rides the sketch build: every item increments exactly one
    // bucket per hash row, so each grid row sums to the corpus count —
    // no separate items.count() pass (at 100 TB a whole extra scan).
    // The row-sum law is pinned in OperatorsSpec.
    val grid = collectGrid(items, keyCol, d, w)
    val n = grid(0).sum
    heavyHittersFromGrid(items, keyCol, grid, (phiNum * n + phiDen - 1) / phiDen, d, w)
  }

  def heavyHitters(items: DataFrame, keyCol: String, threshold: Long,
      d: Int, w: Int): DataFrame =
    heavyHittersFromGrid(items, keyCol, collectGrid(items, keyCol, d, w), threshold, d, w)

  /** Build the sketch and collect the d×w grid (<= a few KB) to the
    * driver as literal-foldable arrays.
    */
  private[graft] def collectGrid(items: DataFrame, keyCol: String, d: Int, w: Int): Array[Array[Long]] = {
    val cells = countMinSketch(items, keyCol, d, w).collect()
    val grid = Array.fill(d)(new Array[Long](w))
    cells.foreach(r => grid(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    grid
  }

  private def heavyHittersFromGrid(items: DataFrame, keyCol: String, grid: Array[Array[Long]],
      threshold: Long, d: Int, w: Int): DataFrame = {
    def est(key: org.apache.spark.sql.Column) = {
      val rows = (0 until d).map(r =>
        element_at(typedlit(grid(r).toSeq), bucket(key, r, w).cast("int") + 1))
      if (rows.size == 1) rows.head else least(rows: _*) // least() rejects a single arg
    }
    items.filter(est(col(keyCol)) >= threshold)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("key"), est(col("key")).as("est"), col("cnt"))
  }

  /** Approximate pairwise distinct-overlap matrix via HLL sketches
    * (Spark's built-in Apache DataSketches `hll_sketch_agg` /
    * `hll_union`): one sketch per tag (source / dump / shard), then
    * inclusion-exclusion `|A| + |B| − |A∪B|` on the merged sketches
    * for every tag pair. The 100 TB shape for "which dumps repeat
    * each other": the corpus is scanned ONCE (one grouped sketch
    * aggregation whose state is ~2^lgK bytes per tag — kilobytes,
    * regardless of corpus size), and the tags² pair work happens on
    * broadcast-sized sketches, where the exact matrix
    * ([[Curation.crossSourceDupMatrix]]) must shuffle every distinct
    * (key, tag) row. Estimates carry the sketch's ~1.04/√2^lgK
    * relative error on each of the three terms, so the overlap error
    * is bounded relative to the UNION, not the overlap — callers
    * grade tolerance against `est_union`.
    */
  def hllOverlapMatrix(items: DataFrame, tagCol: String, keyCol: String,
      lgK: Int = 14): DataFrame = {
    val sk = items.groupBy(col(tagCol))
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sk"))
    sk.as("a").join(sk.as("b"), col(s"a.$tagCol") < col(s"b.$tagCol"))
      .select(col(s"a.$tagCol").as("tag_a"), col(s"b.$tagCol").as("tag_b"),
        expr("hll_sketch_estimate(a.sk)").as("est_a"),
        expr("hll_sketch_estimate(b.sk)").as("est_b"),
        expr("hll_sketch_estimate(hll_union(a.sk, b.sk))").as("est_union"))
      .withColumn("est_overlap", col("est_a") + col("est_b") - col("est_union"))
  }

  /** Mergeable distinct-count rollup: build one HLL sketch per fine
    * bucket (e.g. per day) in a single corpus pass, then answer ANY
    * coarse range (months, quarters, arbitrary windows) by
    * `hll_union_agg` over the kilobyte sketches — never rescanning the
    * rows. This mergeability is THE reason sketches beat exact
    * distinct at 100 TB: daily sketches persist at rest and every
    * later rollup is a metadata-sized aggregation. Returns one row per
    * coarse bucket with the estimate.
    *
    * `fineBucket`/`coarseBucket` are expressions over the input (the
    * coarse bucket must be a function of the fine one for the rollup
    * to be exact-in-structure, e.g. day → month).
    */
  def distinctRollup(items: DataFrame, keyCol: String, fineBucket: Column,
      coarseBucket: Column, lgK: Int = 14): DataFrame = {
    val daily = items
      .select(fineBucket.as("fine"), coarseBucket.as("coarse"), col(keyCol))
      .groupBy(col("fine"), col("coarse"))
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sk"))
    daily.groupBy(col("coarse"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"),
        count(lit(1)).cast("int").as("n_fine_buckets"))
  }
}
