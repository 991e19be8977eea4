package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure range joins (no equi-key) rewritten as bin-bucketed equi-joins.
  *
  * Spark plans a join whose only predicate is a range comparison as
  * BroadcastNestedLoopJoin: every row of one side is compared against
  * EVERY row of the other (and one side must fit in memory whole) —
  * correct at test scale, O(n·m) and OOM-prone at 100 TB. The standard
  * fix (built into engines with range-join optimization; Spark's open
  * API makes it a rewrite): quantize the range dimension into
  * fixed-width bins, replicate each interval into the bins it covers,
  * put each point in its one bin, then the bin id is an EQUI key —
  * Catalyst plans a shuffled hash/sort-merge join partitioned by bin,
  * and the residual `lo <= p <= hi` filters within buckets.
  *
  * Cost model: interval replication = len/binWidth + 1 rows, bucket
  * population = rows whose value falls in one bin — `binWidth` trades
  * one against the other (set it near the median interval length).
  * Skewed bins (a hot value range) are ordinary equi-join skew,
  * handled by AQE skew splitting or [[Relational.saltedJoin]] — which
  * is the point: the rewrite turns an unscalable plan shape into the
  * shape every other tool in this library already handles.
  */
object RangeJoin {

  private def bin(c: Column, w: Double): Column =
    floor(c / lit(w)).cast("long")

  /** Join `points` to the `intervals` containing them
    * (`lo <= point <= hi`, inclusive both ends): each interval
    * replicates into its covering bins, each point lives in exactly
    * one bin — so the equi-join emits each qualifying pair exactly
    * once, no post-dedup. Returns all columns of both inputs.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals.withColumn("_bin",
      explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
    val pt = points.withColumn("_bin", bin(col(pointCol), binWidth))
    pt.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Join two interval sets on overlap (`a.lo <= b.hi AND b.lo <=
    * a.hi`): both sides replicate into covering bins; a pair would
    * meet in every shared bin, so it is emitted only in the FIRST bin
    * both cover — bin == floor(max(lo_a, lo_b) / w) — which each
    * qualifying pair has exactly one of (no post-dedup shuffle).
    */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.withColumn("_bin",
      explode(sequence(bin(col(leftLo), binWidth), bin(col(leftHi), binWidth))))
    val r = right.withColumn("_bin",
      explode(sequence(bin(col(rightLo), binWidth), bin(col(rightHi), binWidth))))
    l.join(r, Seq("_bin"))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col("_bin") === bin(greatest(col(leftLo), col(rightLo)), binWidth))
      .drop("_bin")
  }
}
