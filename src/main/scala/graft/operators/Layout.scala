package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization for at-rest multi-dimensional pruning —
  * the 100 TB concern the in-session operators can't address: which
  * FILES a later query has to open. A corpus written in arrival order
  * has every file spanning the whole range of every column, so a scan
  * filtered on (lang-bucket, length-bucket, quality-bucket, ...) still
  * opens everything. Interleaving the dimensions' bits into one
  * Z-(Morton-)value and range-partition-sorting on it clusters rows
  * that are close in EVERY dimension into the same files, so each
  * file's parquet min/max footer covers a narrow slice of each
  * dimension and engine-standard stats-based skipping prunes on any of
  * them (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; the
  * reference's at-rest story stops at per-reducer chunk files,
  * `/root/reference/dampr/dataset.py:200-260`).
  *
  * The z-value is pure Column arithmetic (shift/mask/add over disjoint
  * bits), so it rides whole-stage codegen; the only movement is the
  * one range-exchange the rewrite IS.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * dimensions: result bit 2i is bit i of `x`, bit 2i+1 is bit i of
    * `y`. Callers bucket/clamp each dimension into [0, 2^bits) first —
    * higher bits are ignored by construction, and two values equal
    * mod 2^bits would collide (destroying locality, not correctness).
    */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // disjoint bits, so + is | — and stays a codegen'd add chain
    terms.reduce(_ + _)
  }

  /** k-dimensional Morton interleave: bit j of dimension i lands at
    * position j*k + i (so [[zorder2]] is `zorderN(Seq(x, y), bits)`).
    * k*bits must fit a signed long. Same contract: callers bucket each
    * dimension into [0, 2^bits) first.
    */
  def zorderN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.length
    require(k >= 1, "zorderN needs at least one dimension")
    require(bits >= 1 && k * bits <= 62, s"k*bits must be in [1,62], got ${k * bits}")
    val terms = for (j <- 0 until bits; i <- 0 until k)
      yield shiftleft(shiftright(dims(i), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` at `path` clustered by the z-curve over (`x`, `y`):
    * compute `zval`, range-partition into `partitions` output files on
    * it (Spark samples the distribution for balanced bounds — the same
    * mechanism a sort uses), sort within each file, write parquet. The
    * written files carry `zval` plus all input columns; each file's
    * min/max footer then bounds BOTH dimensions tightly, which is what
    * makes later scans prune on either one (LayoutSpec measures it).
    */
  def zorderWrite(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int, partitions: Int): Unit =
    df.withColumn("zval", zorder2(x.cast("long"), y.cast("long"), bits))
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of a column over a parquet directory — the exact
    * statistics stats-based file skipping consults, recomputed from
    * the rows so the spec's pruning claim is engine-independent.
    * Returns (file, min, max) rows.
    */
  def fileRanges(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** Write a per-file column-stats manifest beside the data
    * (`path/_manifest` — underscore-prefixed, so plain readers of
    * `path` never see it): one row per data file with row count and
    * min/max of each stats column. This is the file-skipping half of
    * the Delta/Iceberg table-format idea ([[Versioned]] has the
    * transaction half): a planner that consults KILOBYTES of manifest
    * decides which of a 100 TB table's files a filtered scan must
    * open, instead of opening every footer. One file-local pass over
    * the snapshot (the group key is the file itself, so partial
    * aggregation reduces each split to one row — the shuffle carries
    * ~one row per file); the manifest lands as a single small file.
    *
    * Call after the snapshot is fully written (the writer owns the
    * manifest lifecycle, like [[zorderWrite]] owns layout); rewriting
    * data without re-writing the manifest makes it stale — same
    * contract as every manifest format.
    */
  def writeManifest(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeManifest: at least one stats column")
    val stats = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), stats: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Globally-sorted export: range-partition on `c` (sampled balanced
    * bounds, the same mechanism a total sort uses), sort within each
    * file, write parquet WITH the stats manifest. The result is the
    * "sorted table" layout: file ranges on `c` are pairwise
    * non-overlapping (LayoutSpec pins it), so a point or range lookup
    * binary-searches the manifest to O(1) candidate files — the
    * single-dimension specialization of [[zorderWrite]] (one hot
    * lookup column beats interleaving when queries only ever filter
    * that column). One range exchange, no other movement.
    */
  def sortedWrite(df: DataFrame, path: String, c: String, partitions: Int): Unit = {
    df.repartitionByRange(partitions, col(c))
      .sortWithinPartitions(col(c))
      .write.mode("overwrite").parquet(path)
    writeManifest(df.sparkSession, path, Seq(c))
  }

  /** Data files whose `[min_c, max_c]` manifest range intersects
    * `[lo, hi]` — the candidate set a range-filtered scan must open.
    * Driver-side and manifest-sized (one row per file), never touches
    * the data.
    */
  def prunedFiles(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(s"$path/_manifest")
      .filter(col(s"min_$c") <= hi && col(s"max_$c") >= lo)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Manifest-pruned scan: plan the parquet read over only the files
    * [[prunedFiles]] admits for `c ∈ [lo, hi]`. File granularity is
    * coarse — surviving files may still hold out-of-range rows — so
    * the EXACT predicate is re-applied here; the manifest only decides
    * what gets opened. Composes with [[zorderWrite]]: the z-layout is
    * what makes per-file ranges narrow enough that most files fall out.
    */
  def prunedRead(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    val files = prunedFiles(spark, path, c, lo, hi)
    val in = if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
    in.filter(col(c) >= lo && col(c) <= hi)
  }
}
