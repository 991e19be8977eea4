package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: interleave law + the at-rest pruning claim the
  * operator exists for (per-file min/max tightness on both dims).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 matches the bit-interleave definition") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rows = (0L until 512L).map(i => (i % 37, i % 29))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorder2(col("x"), col("y"), 8).as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(2) === ref(r.getLong(0), r.getLong(1), 8)))
    // high bits beyond `bits` are ignored by construction
    val z = Seq((1027L, 3L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), 2).as("z")).head().getLong(0)
    assert(z === ref(3L, 3L, 2))
  }

  test("zorderN generalizes zorder2 and stays injective at 3 dims") {
    val rows = (0L until 400L).map(i => (i % 19, i % 23, i % 29))
    val df = rows.toDF("x", "y", "w")
    // 2-dim agreement with the specialized form
    val both = df.select(
      Layout.zorder2(col("x"), col("y"), 8).as("z2"),
      Layout.zorderN(Seq(col("x"), col("y")), 8).as("zn")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // 3-dim injectivity on distinct triples
    val zs = df.distinct()
      .select(Layout.zorderN(Seq(col("x"), col("y"), col("w")), 5).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === rows.distinct.length)
  }

  test("zorder layout bounds BOTH dimensions per file; a single-dim sort bounds only its own") {
    // 4096 rows on a full 64x64 grid of (x, y) — the worst case for
    // any single-column sort: the other dimension is uniform everywhere
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.zorderWrite(grid, s"$base/zorder", col("x"), col("y"), bits = 6, partitions = 8)
    // baseline: same file count, sorted on x alone
    grid.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/xsort")

    def candidates(path: String, c: String, lo: Long, hi: Long): Long =
      Layout.fileRanges(spark, path, c)
        .filter(col("lo") <= hi && col("hi") >= lo).count()

    // a 16-wide window on either dimension: the z-layout's 8 files
    // split ~3 z-prefix bits (y5, x5, y4 — exactly 4 x-candidates and
    // 2 y-candidates at ideal cuts; repartitionByRange SAMPLES its
    // bounds, so a file can straddle a prefix boundary and widen by
    // one), so stats-based skipping prunes on EITHER dimension
    assert(candidates(s"$base/zorder", "x", 0, 15) <= 5)
    assert(candidates(s"$base/zorder", "y", 0, 15) <= 4)
    // the x-sorted baseline prunes x but every file spans all of y:
    // a y-window query opens the entire corpus
    assert(candidates(s"$base/xsort", "x", 0, 15) <= 3)
    assert(candidates(s"$base/xsort", "y", 0, 15) === 8)
  }

  test("stats manifest: prunedRead equals the plain filter and opens a strict subset of files") {
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val path = s"$base/z"
    Layout.zorderWrite(grid, path, col("x"), col("y"), bits = 6, partitions = 8)
    Layout.writeManifest(spark, path, Seq("x", "y"))

    // manifest: one row per data file, row counts sum to the corpus
    val m = spark.read.parquet(s"$path/_manifest")
    val nFiles = spark.read.parquet(path).select(input_file_name()).distinct().count()
    assert(m.count() === nFiles)
    assert(m.agg(sum(col("n_rows"))).head().getLong(0) === 4096L)

    // pruning consults only the manifest and skips most files …
    assert(Layout.prunedFiles(spark, path, "x", 0, 15).size <= 5)
    assert(Layout.prunedFiles(spark, path, "y", 0, 15).size <= 4)

    // … while the pruned scan's RESULT is exactly the plain filter's
    // (file granularity is repaired by the residual predicate)
    val got = Layout.prunedRead(spark, path, "x", 0, 15)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    val want = grid.filter(col("x") <= 15)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    // the pruned plan really reads fewer files than live at rest
    val opened = Layout.prunedRead(spark, path, "x", 0, 15).inputFiles.length
    assert(opened < nFiles)

    // empty intersection: no files opened, schema preserved, zero rows
    val none = Layout.prunedRead(spark, path, "x", 100, 200)
    assert(none.count() === 0L)
    assert(none.columns.contains("id"))
  }

  test("sortedWrite: file ranges are pairwise non-overlapping, point lookups open one file") {
    // shuffled input so the sort actually has to move everything
    val rows = scala.util.Random.shuffle((0L until 4000L).toVector)
      .map(i => (i, i % 97)).toDF("v", "tag")
    val base = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val path = s"$base/s"
    Layout.sortedWrite(rows, path, "v", partitions = 8)

    // manifest ranges sorted by lo must not overlap (same value never
    // splits across files under range partitioning)
    val ranges = spark.read.parquet(s"$path/_manifest")
      .select(col("min_v"), col("max_v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ranges.length === 8)
    ranges.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) => assert(hiPrev < loNext)
      case _ =>
    }
    // a point lookup opens exactly one file; result matches
    assert(Layout.prunedFiles(spark, path, "v", 1234, 1234).size === 1)
    val got = Layout.prunedRead(spark, path, "v", 1234, 1234)
      .select(col("tag")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1234L % 97))
  }
}
