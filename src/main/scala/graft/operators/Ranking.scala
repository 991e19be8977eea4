package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scale-safe global ranking: exact `row_number()` / running sums /
  * `ntile(k)` over a TOTAL order without ever planning a
  * partition-less `WindowExec` (which moves the whole frame to one
  * task — Spark logs `WindowExec: No Partition Defined` and a 100 TB
  * corpus serializes through a single straggler).
  *
  * Two shapes, both O(rows) work with bounded driver state:
  *
  *  - [[globalRankCumsum]] — range-repartition on the sort key, sort
  *    within partitions, then two passes: partition sizes/sums (one
  *    tiny collect, one row per partition) become broadcast offsets,
  *    and a per-partition streaming scan assigns `offset + local
  *    position` (and `offset + local running sum`). Exactly the
  *    distributed prefix-sum every MPP engine plans for `ROW_NUMBER()
  *    OVER (ORDER BY …)`.
  *  - [[globalNtile]] — bucket BOUNDARIES are exact order statistics
  *    (rows at ranks i·⌊n/k⌋+min(i, n mod k)), fetched by
  *    [[orderStatistics]] from a skinny key-only projection; the
  *    bucket assignment is then a map-side comparison against the
  *    k-1 broadcast boundary tuples — no shuffle of the full frame at
  *    all beyond the skinny selection pass.
  *
  * CONTRACT: the key list must be a STRICT TOTAL ORDER over the frame
  * (append a unique id as the last key — every call site here does),
  * and key columns must be non-null. Under that contract both shapes
  * are value-identical to their window forms (`ntile(k).over(orderBy)`,
  * `row_number().over(orderBy)`, running `sum().over(orderBy)`), which
  * is what keeps the DuckDB oracles unchanged: ties never straddle a
  * boundary because there are no ties in the composite key.
  *
  * Intermediate persists go through [[graft.GraftCache]] (release
  * discipline documented there). Running sums are LONG-only by design:
  * integer prefix sums are associative, so per-partition offsets
  * reproduce the sequential window result bit-for-bit — double
  * accumulation would not.
  */
object Ranking {

  /** One sort key: expression + direction. */
  final case class Key(c: Column, asc: Boolean = true)

  private def kName(i: Int): String = s"_gr_k$i"

  private def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  private def sortCols(keys: Seq[Key]): Seq[Column] =
    keys.zipWithIndex.map { case (k, i) => if (k.asc) col(kName(i)).asc else col(kName(i)).desc }

  /** Range-sorted frame carrying the original columns plus the
    * materialized key columns `_gr_k*`; persisted via GraftCache so the
    * offsets pass and the output pass share one computation.
    */
  private def sortedWithKeys(df: DataFrame, keys: Seq[Key]): DataFrame = {
    val aug = df.select(col("*") +: keys.zipWithIndex.map { case (k, i) => k.c.as(kName(i)) }: _*)
    graft.GraftCache.registered(
      aug.repartitionByRange(shufflePartitions(df), sortCols(keys): _*)
        .sortWithinPartitions(sortCols(keys): _*))
  }

  /** `row > boundary` in the composite sort order — the lexicographic
    * comparison unrolled over the key list with literal boundary
    * values, so it stays a codegen-able Column predicate.
    */
  private def afterBoundary(keys: Seq[Key], b: Row): Column =
    keys.indices.map { i =>
      val eqPrefix = (0 until i)
        .map(j => col(kName(j)) <=> lit(b.get(j)))
        .foldLeft(lit(true))(_ && _)
      val strict =
        if (keys(i).asc) col(kName(i)) > lit(b.get(i))
        else col(kName(i)) < lit(b.get(i))
      eqPrefix && strict
    }.reduce(_ || _)

  /** Exact `ntile(k)` over the total order given by `keys` — identical
    * output to `ntile(k).over(Window.orderBy(keys…))` under the strict
    * total-order contract, with the bucket assignment a broadcast
    * comparison instead of a single-partition sort.
    */
  def globalNtile(df: DataFrame, keys: Seq[Key], k: Int, outCol: String): DataFrame = {
    require(k >= 1, s"globalNtile: k must be >= 1 (got $k)")
    val proj = df.select(keys.zipWithIndex.map { case (ky, i) => ky.c.as(kName(i)) }: _*)
    val sorted = graft.GraftCache.registered(
      proj.repartitionByRange(shufflePartitions(df), sortCols(keys): _*)
        .sortWithinPartitions(sortCols(keys): _*))
    val (n, byRank) = selectRanks(sorted, n => ntileBoundaryRanks(n, k))
    val bounds = ntileBoundaryRanks(n, k) // with duplicates — each counts once
    val aug = df.select(col("*") +: keys.zipWithIndex.map { case (ky, i) => ky.c.as(kName(i)) }: _*)
    val bucket =
      if (bounds.isEmpty) lit(1)
      else bounds.map(r => when(afterBoundary(keys, byRank(r)), 1).otherwise(0)).reduce(_ + _) + lit(1)
    aug.withColumn(outCol, bucket.cast(IntegerType))
      .drop(keys.indices.map(kName): _*)
  }

  /** Cumulative bucket sizes for `ntile(k)` over `n` rows — the ranks
    * of the last row of buckets 1..k-1 (first `n mod k` buckets get the
    * extra row, per both Spark's and DuckDB's ntile). Duplicates kept
    * on purpose when n < k: a row after TWO coincident boundaries is
    * two buckets further along.
    */
  private[operators] def ntileBoundaryRanks(n: Long, k: Int): Seq[Long] = {
    if (n <= 0) return Seq.empty
    val q = n / k
    val r = n % k
    (1L until k.toLong).map(i => i * q + math.min(i, r)).filter(_ >= 1)
  }

  /** Fetch rows at the requested global ranks from a range-sorted,
    * persisted frame. Pass 1 collects partition sizes (one long per
    * partition); pass 2 scans only the partitions that own a requested
    * rank and short-circuits after the last one.
    */
  private def selectRanks(sorted: DataFrame, ranksFor: Long => Seq[Long]): (Long, Map[Long, Row]) = {
    // `sorted` is the skinny key-only projection, so anyNull here means
    // a NULL SORT KEY — the comparison-based bucket assignment would
    // silently undercount (null > x is null, never true), so refuse
    // loudly instead. Costs nothing: same scan as the size pass.
    val stats = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var cnt = 0L; var nulls = 0L
        it.foreach { r => cnt += 1; if (r.anyNull) nulls += 1 }
        Iterator((pid, cnt, nulls))
      }
      .collect().sortBy(_._1)
    require(stats.map(_._3).sum == 0L,
      s"globalNtile: ${stats.map(_._3).sum} rows have a NULL sort key — the strict " +
        "total-order contract requires non-null keys (coalesce them, or filter nulls " +
        "into their own bucket first)")
    val counts = stats.map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = if (offsets.isEmpty) 0L else offsets.last
    val ranks = ranksFor(n).distinct.filter(r => r >= 1 && r <= n)
    if (ranks.isEmpty) return (n, Map.empty)
    val byPart: Map[Int, Set[Long]] = ranks
      .groupBy(r => offsets.lastIndexWhere(_ < r))
      .map { case (p, rs) => (p, rs.toSet) }
    val offB = offsets
    val found = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      byPart.get(pid) match {
        case None => Iterator.empty
        case Some(rs) =>
          val off = offB(pid)
          val last = rs.max
          it.zipWithIndex
            .map { case (row, i) => (off + i + 1, row) } // global 1-based rank
            .takeWhile(_._1 <= last)
            .filter { case (g, _) => rs.contains(g) }
      }
    }.collect()
    (n, found.toMap)
  }

  /** Exact (count, total, running-sum-at-rank) for SELECTED global
    * ranks — the point lookup [[globalRankCumsum]] generalizes: when a
    * query needs the running sum only at a handful of ranks (Pareto
    * top-p% readouts, percentile cut masses), materializing the full
    * ranked frame is O(n) wasted work. Same range-sorted frame and
    * per-partition (count, sum) offsets; each requested rank then
    * costs a scan of ONE partition up to its local position (early-
    * terminated), so total extra work is bounded by partition size,
    * not corpus size. `valueCol` must be LONG (exact prefix sums).
    * `ranksFor(n)` maps the discovered total count to the wanted
    * 1-based ranks; out-of-range ranks are ignored.
    */
  def cumsumAtRanks(df: DataFrame, keys: Seq[Key], valueCol: String,
      ranksFor: Long => Seq[Long]): (Long, Long, Map[Long, Long]) = {
    val sorted = sortedWithKeys(df, keys)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"cumsumAtRanks: running sums are LONG-only for exactness; '$valueCol' is ${sorted.schema(vIdx).dataType}")
    val stats = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var s = 0L
      it.foreach { r => cnt += 1; s += r.getLong(vIdx) }
      Iterator((pid, cnt, s))
    }.collect().sortBy(_._1)
    val rankOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val sumOff = stats.map(_._3).scanLeft(0L)(_ + _)
    val n = if (rankOff.isEmpty) 0L else rankOff.last
    val total = if (sumOff.isEmpty) 0L else sumOff.last
    val ranks = ranksFor(n).distinct.filter(r => r >= 1 && r <= n)
    if (ranks.isEmpty) return (n, total, Map.empty)
    val byPart: Map[Int, Set[Long]] = ranks
      .groupBy(r => rankOff.lastIndexWhere(_ < r))
      .map { case (p, rs) => (p, rs.toSet) }
    val found = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      byPart.get(pid) match {
        case None => Iterator.empty
        case Some(rs) =>
          val off = rankOff(pid)
          var c = sumOff(pid)
          val last = rs.max
          it.zipWithIndex
            .map { case (row, i) => c += row.getLong(vIdx); (off + i + 1, c) }
            .takeWhile(_._1 <= last)
            .filter { case (g, _) => rs.contains(g) }
      }
    }.collect()
    (n, total, found.toMap)
  }

  /** Exact global `row_number()` (1-based LONG `rankCol`) over the
    * total order given by `keys`, plus — when `cumsumOf` is set — the
    * exact running sum of that LONG column in `cumCol`. The
    * range-partitioned two-pass prefix sum: partition offsets from one
    * tiny collect, then a streaming per-partition scan. Value-identical
    * to `row_number().over(Window.orderBy…)` / `sum(v).over(orderBy…
    * rowsBetween(unboundedPreceding, currentRow))` under the strict
    * total-order contract.
    */
  def globalRankCumsum(df: DataFrame, keys: Seq[Key], rankCol: String,
      cumsumOf: Option[String] = None, cumCol: String = "_cum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = sortedWithKeys(df, keys)
    val vIdx = cumsumOf.map { c =>
      val idx = sorted.schema.fieldIndex(c)
      require(sorted.schema(idx).dataType == LongType,
        s"globalRankCumsum: running sums are LONG-only for exactness; '$c' is ${sorted.schema(idx).dataType}")
      idx
    }
    val stats = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L; var s = 0L
      it.foreach { r => cnt += 1; vIdx.foreach(i => s += r.getLong(i)) }
      Iterator((pid, cnt, s))
    }.collect().sortBy(_._1)
    val rankOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val sumOff = stats.map(_._3).scanLeft(0L)(_ + _)
    val baseFields = sorted.schema.fields
    val outSchema = StructType(baseFields ++
      (StructField(rankCol, LongType, nullable = false) +:
        vIdx.map(_ => StructField(cumCol, LongType, nullable = false)).toSeq))
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rk = rankOff(pid)
      var c = sumOff(pid)
      it.map { r =>
        rk += 1
        vIdx match {
          case Some(i) => c += r.getLong(i); Row.fromSeq(r.toSeq :+ rk :+ c)
          case None => Row.fromSeq(r.toSeq :+ rk)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
      .drop(keys.indices.map(kName): _*)
  }
}
