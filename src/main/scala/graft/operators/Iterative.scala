package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared per-round lineage-cut discipline for the iterative operators
  * ([[Dedup.connectedComponents]], [[Graph.pageRankInt]],
  * [[Graph.personalizedPageRankInt]], [[Graph.bfsLevels]],
  * [[Sequence.kcorePeel]]): every round's frame is EAGERLY pinned so
  * the logical plan stays one round deep (a star/join references its
  * input multiple times — without truncation the plan grows
  * geometrically and the analyzer, not the data, becomes the
  * bottleneck).
  *
  * Two durability flavors, chosen per call:
  *  - default (`checkpointDir = None`): eager `localCheckpoint` —
  *    fastest, but blocks live on executors and CANNOT be recomputed
  *    after executor loss once lineage is cut. Right for local mode
  *    and preemption-free clusters.
  *  - `checkpointDir = Some(dir)` (HDFS/S3 on a real cluster):
  *    reliable `.checkpoint()` — each round persists to storage, so a
  *    1000-executor run survives preemption mid-iteration. Same
  *    algorithm, same result (OperatorsSpec pins both modes equal).
  */
object Iterative {
  def pin(spark: SparkSession, checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
}
