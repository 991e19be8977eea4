package graft

/** Smoke: the driver contract itself — entry returns rows, every
  * declared query runs at sf0.001, and every oracle key has a query.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query executes at sf0.001") {
    // toRdd.count() forces EVERY output column: a plain count() lets
    // Catalyst prune projections, which would hide expressions that
    // throw (or crawl — see NOTES_r4 on q75/q88) on real data
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf001).queryExecution.toRdd.count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    GraftCache.releaseAll()
  }
}
