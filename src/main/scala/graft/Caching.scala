package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for the intermediate frames the pair/ANN pipelines persist
  * (signature sets, verified pairs, float projections). Spark's
  * CacheManager keeps a persisted frame for the whole session, so a
  * long-lived session composing many pipelines would otherwise accrete
  * cache entries it can never reach again. Every internal `persist` in
  * graft goes through [[registered]]; callers (or pipeline entry points
  * like the CleanCorpus CLI) call [[releaseAll]] after the terminal
  * action to drop exactly the frames graft created — user-persisted
  * frames are untouched (unlike `spark.catalog.clearCache()`).
  *
  * Releasing is safe at any time: an unpersisted frame recomputes from
  * lineage on the next action, so at worst a release mid-pipeline costs
  * time, never correctness.
  */
object GraftCache {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` (MEMORY_AND_DISK by default) and track it for
    * [[releaseAll]]. Returns `ds` itself.
    */
  private[graft] def registered[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    frames.add(ds)
    ds
  }

  /** Number of graft-persisted frames not yet released. */
  def pendingCount: Int = frames.size()

  /** Unpersist every frame graft pipelines have persisted since the
    * last release. Non-blocking: executors free the blocks
    * asynchronously.
    */
  def releaseAll(): Unit = {
    var ds = frames.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = frames.poll()
    }
  }
}
