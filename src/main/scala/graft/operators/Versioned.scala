package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned at-rest table with atomic pointer-swap commits — the
  * minimal table-format discipline (the idea behind Delta/Iceberg's
  * log, reduced to one pointer) that a mutable 100 TB corpus needs and
  * plain parquet directories lack:
  *
  *  - every commit writes a COMPLETE new snapshot under `v=<n>/`, then
  *    atomically swaps the `_latest` pointer file. Readers resolve the
  *    pointer once and read an immutable directory — a reader racing a
  *    writer sees the old version in full, never a half-written mix;
  *  - a crashed writer leaves an orphan `v=<n>` directory and an
  *    untouched pointer: the table is unaffected (crash-safe by
  *    construction, no cleanup needed for correctness);
  *  - old versions stay readable by number ([[read]] with an explicit
  *    version — time travel for reproducing a training run's exact
  *    corpus) until [[vacuum]] removes all but the latest.
  *
  * [[upsert]] is the CDC/refresh primitive: new-batch rows replace
  * same-key rows and append the rest — one left-anti join + union, so
  * the cost is a keyed shuffle of (current ∪ batch), not a random-
  * access rewrite. On a real cluster the pointer swap maps to the
  * object store's atomic rename/put-if-absent; everything else is
  * already plain distributed parquet I/O.
  *
  * The reference's at-rest lifecycle stops at write-once chunk
  * datasets (`/root/reference/dampr/dataset.py:200-260`); this is the
  * upgrade a mutable corpus forces.
  */
object Versioned {

  private def pointer(path: String) = Paths.get(path, "_latest")

  /** The committed latest version, or None for an empty/uninitialized
    * table.
    */
  def latestVersion(path: String): Option[Long] = {
    val p = pointer(path)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  /** All version numbers present at rest (committed or orphaned). */
  def versions(path: String): Seq[Long] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Write `df` as the next version and commit it: snapshot first,
    * pointer swap last (write-to-temp + atomic move, so a torn pointer
    * write can never be observed). Returns the committed version.
    *
    * With `statsCols`, a [[Layout.writeManifest]] per-file min/max
    * manifest is written INSIDE the version directory before the
    * pointer swaps — a committed version always carries its stats, so
    * [[prunedRead]] can file-skip any committed snapshot (including
    * time-travel reads; each version's manifest describes exactly its
    * own immutable files).
    */
  def commit(path: String, df: DataFrame, statsCols: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Long = {
    // next = past every directory on disk, not just the committed
    // pointer — a crashed writer's orphan dir is never write-raced
    val next = (versions(path) ++ latestVersion(path)).foldLeft(-1L)(math.max) + 1
    val w = df.write.mode("overwrite")
    // Hive-style partition layout inside the snapshot: a filtered read
    // of the committed version prunes whole partition directories at
    // PLANNING time (PartitionFilters in the scan — zero files listed,
    // let alone opened, for excluded partitions). The coarse,
    // low-cardinality complement of the row-level stats manifest; a
    // later partitioned commit (incl. upserts of such a table) must
    // pass the same partitionBy to keep the layout.
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$path/v=$next")
    if (statsCols.nonEmpty)
      Layout.writeManifest(df.sparkSession, s"$path/v=$next", statsCols)
    val tmp = Paths.get(path, s"_latest.tmp.$next")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read a specific version, or the committed latest. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalStateException(s"versioned table at $path has no committed version"))
    spark.read.parquet(s"$path/v=$v")
  }

  /** Merge `updates` into the table by `key`: matching-key rows are
    * replaced, new keys appended, everything else carried over —
    * committed as one new snapshot. An uninitialized table commits the
    * batch as v0. A partitioned table must pass the same `partitionBy`
    * on every mutation (same contract as [[commit]]/[[applyChanges]]) —
    * otherwise the new snapshot would silently lose the Hive layout and
    * with it planning-time partition pruning.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame, key: String,
      statsCols: Seq[String] = Nil, partitionBy: Seq[String] = Nil): Long =
    latestVersion(path) match {
      case None => commit(path, updates, statsCols, partitionBy)
      case Some(v) =>
        val cur = read(spark, path, Some(v))
        commit(path, cur.join(updates.select(col(key)), Seq(key), "left_anti")
          .unionByName(updates), statsCols, partitionBy)
    }

  /** [[upsert]] with EXPLICIT schema evolution: the batch may ADD
    * columns (carried-over rows backfill null) or omit existing ones
    * (batch rows backfill null). Evolution is a separate entry point
    * on purpose — plain [[upsert]] refuses a drifted batch loudly,
    * because silent widening is how a typo'd column name becomes a
    * permanently null "feature"; calling this method IS the sign-off.
    * The key column must exist on both sides.
    */
  def upsertEvolve(spark: SparkSession, path: String, updates: DataFrame,
      key: String, statsCols: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Long =
    latestVersion(path) match {
      case None => commit(path, updates, statsCols, partitionBy)
      case Some(v) =>
        val cur = read(spark, path, Some(v))
        commit(path,
          cur.join(updates.select(col(key)), Seq(key), "left_anti")
            .unionByName(updates, allowMissingColumns = true),
          statsCols, partitionBy)
    }

  /** Manifest-pruned scan of a committed snapshot (latest by default):
    * [[Layout.prunedRead]] against the version's own `_manifest`, so a
    * range-filtered read of a 100 TB versioned corpus opens only the
    * files whose stats intersect — the table-format composition of the
    * transaction half (this object) and the skipping half ([[Layout]]).
    * The version must have been committed with `statsCols` covering `c`.
    */
  def prunedRead(spark: SparkSession, path: String, c: String, lo: Long, hi: Long,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(path)).getOrElse(
      throw new IllegalStateException(s"versioned table at $path has no committed version"))
    Layout.prunedRead(spark, s"$path/v=$v", c, lo, hi)
  }

  /** Apply a full CDC change batch — the mutation [[upsert]] cannot
    * express: DELETES. `changes` carries an op column (`delete` rows
    * need only the key; everything else is a full replacement/insert
    * row). One left-anti join removes every changed key from the
    * current snapshot, the non-delete rows union back in, and the
    * result commits as ONE new snapshot — atomic like every commit,
    * with deletes/updates/inserts visible together or not at all.
    * Keys are unique per batch by contract (a replayed log should be
    * compacted to final-state-per-key first).
    */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
      key: String, opCol: String = "op", statsCols: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Long = {
    val upserts = changes.filter(col(opCol) =!= "delete").drop(opCol)
    latestVersion(path) match {
      // uninitialized table: bootstrap from the batch's non-delete rows,
      // matching upsert's contract (deletes against nothing are no-ops)
      case None => commit(path, upserts, statsCols, partitionBy)
      case Some(v) =>
        val cur = read(spark, path, Some(v))
        commit(path,
          cur.join(changes.select(col(key)), Seq(key), "left_anti")
            .unionByName(upserts),
          statsCols, partitionBy)
    }
  }

  /** Rewrite the latest snapshot as a new version with `files` output
    * files — the small-files compaction pass a long upsert history
    * needs (every upsert writes a full snapshot at the then-current
    * parallelism; at rest, scan cost tracks file count as much as
    * bytes). Readers of older versions are unaffected; the pointer
    * swaps only once the compacted snapshot is complete.
    */
  def compact(spark: SparkSession, path: String, files: Int): Long =
    commit(path, read(spark, path).repartition(files))

  /** Drop every version directory except the committed latest (the
    * retention pass — run only once no reader needs time travel past
    * the horizon).
    */
  def vacuum(path: String): Unit = {
    val keep = latestVersion(path)
    versions(path).filter(v => !keep.contains(v)).foreach { v =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        Paths.get(path, s"v=$v").toFile)
    }
  }

  /** Change-data feed between two committed snapshots: one row per
    * changed key with `op` ∈ insert / update / delete — what a
    * downstream incremental consumer (index refresh, replication)
    * reads instead of re-scanning the table. Keyed full-outer join of
    * the two snapshot scans; non-key columns compare as a struct with
    * null-safe equality. At rest both sides are complete snapshots,
    * so the diff costs one co-partitioned join of the two versions —
    * there is no manifest metadata to shortcut it, which is the
    * simplicity/readback trade this format makes (vs. manifest
    * formats whose diff is file-level).
    */
  def diff(spark: SparkSession, path: String, vFrom: Long, vTo: Long,
      key: String): DataFrame = {
    val a = read(spark, path, Some(vFrom))
    val b = read(spark, path, Some(vTo))
    val cols = b.columns.filterNot(_ == key)
    val av = a.select(col(key), struct(cols.map(col): _*).as("va"))
    val bv = b.select(col(key), struct(cols.map(col): _*).as("vb"))
    av.join(bv, Seq(key), "full_outer")
      .withColumn("op",
        when(col("va").isNull, "insert")
          .when(col("vb").isNull, "delete")
          .when(!(col("va") <=> col("vb")), "update"))
      .filter(col("op").isNotNull)
      .select(col("op"), col(key))
  }

  /** Per-column profile drift between two committed snapshots: row
    * count, null count, exact distinct count, and min/max (rendered as
    * strings so heterogeneous columns share one schema) for each named
    * column, from-vs-to side by side — the schema/stats half of change
    * review, complementing [[diff]]'s row-level feed. The check a
    * pipeline runs BEFORE promoting a new snapshot: a lang column
    * whose distinct count doubled, or an n_chars max that jumped 1000x,
    * is a generator bug caught at commit review instead of by a
    * downstream model.
    *
    * Cost: ONE aggregate pass per snapshot (all columns' stats in a
    * single job — multiple distinct aggregates plan via Expand, still
    * one scan of the version's files), then a join of two
    * #cols-row frames. Nothing grows with table size but the scans.
    */
  def statsDiff(spark: SparkSession, path: String, vFrom: Long, vTo: Long,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "statsDiff: at least one column")
    def profile(v: Long, tag: String): DataFrame = {
      val df = read(spark, path, Some(v))
      val aggs = Seq(count(lit(1)).as(s"rows_$tag")) ++ cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      df.agg(aggs.head, aggs.tail: _*)
        .select(col(s"rows_$tag"), explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(s"nn_$c").as(s"nulls_$tag"),
            col(s"nd_$c").as(s"distinct_$tag"), col(s"mn_$c").as(s"min_$tag"),
            col(s"mx_$c").as(s"max_$tag"))): _*)).as("s"))
        .select(col("s.*"), col(s"rows_$tag"))
    }
    profile(vFrom, "from").join(profile(vTo, "to"), "col_name")
      .select(col("col_name"), col("rows_from"), col("rows_to"),
        col("nulls_from"), col("nulls_to"),
        col("distinct_from"), col("distinct_to"),
        col("min_from"), col("min_to"), col("max_from"), col("max_to"))
  }
}
