package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.queries.Q

/** Structured Streaming specs: the streaming forms must agree with
  * their batch counterparts on the same events data (SURVEY.md §2.10 —
  * beyond-reference extension).
  */
class StreamingSpec extends SparkSpec {

  test("streaming windowed counts equal batch windowed counts") {
    // write the (nanos-fixed) events as a micro-batch source dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val q = EventStream.runToMemory(spark, tmp, "winout",
      df => EventStream.windowedCounts(df), OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("winout")
      .select(col("wstart"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val batch = Q.events(spark, sf001)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    // append mode emits only watermark-closed windows; every emitted
    // window must match its batch value, and most windows must emit
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
  }

  test("session windows produce bounded per-user sessions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val q = EventStream.runToMemory(spark, tmp, "sessout",
      df => EventStream.sessionCounts(df), OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessout").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_events") > 0))
  }

  test("streaming funnel state equals the batch funnel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_streamf").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val stages = Seq("view", "click", "purchase")
    val q = EventStream.runToMemory(spark, tmp, "funnelout",
      df => EventStream.funnelStream(spark, df, stages), OutputMode.Update())
    q.processAllAvailable(); q.stop()
    // latest state per user from the update stream
    val streamed = spark.table("funnelout")
      .groupBy(col("user_id")).agg(max(col("stage_reached")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.operators.Sequence.funnel(
        Q.events(spark, sf001), "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getAs[Int]("stage_idx") -> r.getAs[Int]("n_users")).toMap
    // batch stage i counts users whose streamed state passed stage i
    for (i <- stages.indices)
      assert(streamed.values.count(_ > i) === batch(i),
        s"stage $i: stream=${streamed.values.count(_ > i)} batch=${batch(i)}")
  }

  test("WINDOWED streaming funnel equals the windowed batch funnel (and differs from unbounded)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_streamwf").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val stages = Seq("view", "click", "purchase")
    val gap = Some(3600L)
    val q = EventStream.runToMemory(spark, tmp, "wfunnelout",
      df => EventStream.funnelStream(spark, df, stages, gap), OutputMode.Update())
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("wfunnelout")
      .groupBy(col("user_id")).agg(max(col("stage_reached")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = graft.operators.Sequence.funnel(
        Q.events(spark, sf001), "user_id", "ts", "event_type", stages, gap)
      .collect().map(r => r.getAs[Int]("stage_idx") -> r.getAs[Int]("n_users")).toMap
    for (i <- stages.indices)
      assert(streamed.values.count(_ > i) === batch(i),
        s"stage $i: stream=${streamed.values.count(_ > i)} batch=${batch(i)}")
    // the gap must actually bite: unbounded batch funnel completes more users
    val unbounded = graft.operators.Sequence.funnel(
        Q.events(spark, sf001), "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getAs[Int]("stage_idx") -> r.getAs[Int]("n_users")).toMap
    assert(unbounded(2) > batch(2),
      s"gap never bit: unbounded=${unbounded(2)} windowed=${batch(2)}")
  }

  test("streaming funnel carries frontier state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val input = MemoryStream[EventStream.UserEvent]
    val q = EventStream.funnelStream(spark, input.toDF(), Seq("view", "click"))
      .writeStream.format("memory").queryName("funnel2")
      .outputMode(OutputMode.Update()).start()
    input.addData(EventStream.UserEvent(7L, ts(10), "view"))
    q.processAllAvailable()
    // click arrives in a LATER batch, after the stored frontier
    input.addData(EventStream.UserEvent(7L, ts(20), "click"))
    q.processAllAvailable(); q.stop()
    val last = spark.table("funnel2")
      .groupBy(col("user_id")).agg(max(col("stage_reached")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(last === Map(7L -> 2))
  }

  test("mapGroupsWithState accumulates running per-user counts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val q = EventStream.runToMemory(spark, tmp, "stateout",
      df => EventStream.runningUserCounts(spark, df), OutputMode.Update())
    q.processAllAvailable(); q.stop()
    val last = spark.table("stateout")
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n"))
    val batch = Q.events(spark, sf001).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val l = last.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l === b)
  }

  test("flatMapGroupsWithState custom sessionizer emits gap-closed sessions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val q = EventStream.runToMemory(spark, tmp, "csessout",
      df => EventStream.customSessions(spark, df, gapSeconds = 1800),
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("csessout").collect()
    assert(sessions.nonEmpty)
    // every emitted session is internally consistent
    assert(sessions.forall { r =>
      r.getAs[Long]("n_events") > 0 && r.getAs[Long]("end_ts") >= r.getAs[Long]("start_ts")
    })
    // closed sessions + open (unemitted) ones must account for all events
    val emitted = sessions.map(_.getAs[Long]("n_events")).sum
    val total = Q.events(spark, sf001).count()
    assert(emitted <= total)
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dd").toString
    val ev = Q.events(spark, sf001)
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    ev.write.mode("append").parquet(s"$tmp/events.parquet") // every event twice
    val q = EventStream.runToMemory(spark, tmp, "dedupout",
      df => EventStream.dedupedEvents(df), OutputMode.Append())
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedupout").count() === ev.count())
    assert(spark.table("dedupout").select("event_id").distinct().count() === ev.count())
  }

  test("streaming Count-Min sketch: running grid equals the batch grid, state bounded at d*w") {
    // the sketch build (explode -> groupBy(r, bucket) -> count) is
    // streaming-native: aggregation STATE is <= d*w cells no matter how
    // long the stream runs — where an exact token->count state grows
    // with the vocabulary. Complete mode emits the running grid.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val texts = Seq(
      "the quick brown fox", "jumps over the lazy dog",
      "the fox again and again", "dog dog dog quick")
    val input = MemoryStream[EventStream.StreamDoc]
    val toks = input.toDF()
      .select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("token"))
    val q = graft.operators.Sketch.countMinSketch(toks, "token", 4, 32).writeStream
      .format("memory").queryName("cmsout")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    // two separate micro-batches — the grid must accumulate across them
    input.addData(texts.take(2).zipWithIndex.map { case (t, i) =>
      EventStream.StreamDoc(i.toLong, t, ts(i * 10)) }: _*)
    q.processAllAvailable()
    input.addData(texts.drop(2).zipWithIndex.map { case (t, i) =>
      EventStream.StreamDoc((i + 2).toLong, t, ts((i + 2) * 10)) }: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cmsout")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.Sketch.countMinSketch(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("token")),
      "token", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.size <= 4 * 32)
  }

  test("streaming corpus curation gates quality and dedups by fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val good = "the quick brown fox jumps over the lazy dog today"
    val input = MemoryStream[EventStream.StreamDoc]
    input.addData(
      EventStream.StreamDoc(1L, good, ts(10)),
      EventStream.StreamDoc(2L, good, ts(20)),          // exact dup (normalized) of 1
      EventStream.StreamDoc(3L, "@@@@ #### $$$$", ts(30)), // junk, fails the quality gate
      EventStream.StreamDoc(4L, "a completely different clean sentence with the usual words", ts(40)))
    val q = EventStream.curatedDocs(input.toDF()).writeStream
      .format("memory").queryName("curout")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("curout")
    assert(out.select("doc_id").as[Long].collect().sorted === Array(1L, 4L))
    // streamed scores equal the batch TextFunctions scores on the same rows
    val batchQ = Seq((1L, good)).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.qualityScore(col("text"))).head.getDouble(0)
    assert(out.filter(col("doc_id") === 1L).head.getAs[Double]("quality") === batchQ)
  }

  test("streaming incremental dedup equals the batch probe of the same at-rest index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val corpusText = "the quick brown fox jumps over the lazy dog in the bright morning sun"
    val corpus = Seq(
      (1L, corpusText),
      (2L, "an entirely different corpus document about distributed query engines"),
      (3L, "yet another unrelated line of plain filler text for the index")).toDF("doc_id", "text")
    graft.operators.Dedup.writeDedupIndex(corpus, "doc_id", "text", s"$base/idx")

    val input = MemoryStream[EventStream.StreamDoc]
    val q = EventStream.incrementalDedupStream(input.toDF(), s"$base/idx", s"$base/out").start()
    // two micro-batches: an exact corpus copy + a fresh doc, then a
    // near-dup edit of the corpus doc + another fresh doc
    input.addData(
      EventStream.StreamDoc(10L, corpusText, ts(10)),
      EventStream.StreamDoc(11L, "completely novel content that matches nothing at all", ts(11)))
    q.processAllAvailable()
    input.addData(
      EventStream.StreamDoc(12L, corpusText + " again tonight", ts(12)),
      EventStream.StreamDoc(13L, "one more brand new document with its own words", ts(13)))
    q.processAllAvailable(); q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    val allNew = Seq(
      (10L, corpusText, ts(10)),
      (11L, "completely novel content that matches nothing at all", ts(11)),
      (12L, corpusText + " again tonight", ts(12)),
      (13L, "one more brand new document with its own words", ts(13))).toDF("doc_id", "text", "ts")
    val batch = graft.operators.Dedup.dedupAgainstIndex(allNew, "doc_id", "text", s"$base/idx")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(streamed === batch)
    // and the verdicts themselves are the interesting ones
    assert(streamed(10L) === "exact_dup")
    assert(streamed(12L) === "near_dup")
    assert(streamed(11L) === "kept" && streamed(13L) === "kept")
  }

  test("streaming contract-index dedup equals the batch contract probe and refuses a legacy index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val base = java.nio.file.Files.createTempDirectory("graft_scdedup").toString
    val corpusText = "the quick brown fox jumps over the lazy dog in the bright morning sun"
    val corpus = Seq(
      (1L, corpusText),
      (2L, "an entirely different corpus document about distributed query engines"),
      (3L, "yet another unrelated line of plain filler text for the index")).toDF("doc_id", "text")
    graft.operators.Dedup.writeDedupIndexContract(corpus, "doc_id", "text", s"$base/idx")

    val input = MemoryStream[EventStream.StreamDoc]
    val pendingBefore = graft.GraftCache.pendingCount
    val q = EventStream.incrementalDedupContractStream(
      input.toDF(), s"$base/idx", s"$base/out").start()
    input.addData(
      EventStream.StreamDoc(10L, corpusText, ts(10)),
      EventStream.StreamDoc(11L, "completely novel content that matches nothing at all", ts(11)))
    q.processAllAvailable()
    input.addData(
      EventStream.StreamDoc(12L, corpusText + " again tonight", ts(12)),
      EventStream.StreamDoc(13L, "one more brand new document with its own words", ts(13)))
    q.processAllAvailable(); q.stop()
    // a long-running stream must return its per-batch signature
    // persists: the registry may not have GROWN across the batches
    assert(graft.GraftCache.pendingCount <= pendingBefore,
      s"stream grew the persist registry: $pendingBefore -> ${graft.GraftCache.pendingCount}")

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    val allNew = Seq(
      (10L, corpusText, ts(10)),
      (11L, "completely novel content that matches nothing at all", ts(11)),
      (12L, corpusText + " again tonight", ts(12)),
      (13L, "one more brand new document with its own words", ts(13))).toDF("doc_id", "text", "ts")
    val batch = graft.operators.Dedup
      .dedupAgainstIndexContract(allNew, "doc_id", "text", s"$base/idx")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(streamed === batch)
    assert(streamed(10L) === "exact_dup")
    assert(streamed(12L) === "near_dup")
    assert(streamed(11L) === "kept" && streamed(13L) === "kept")

    // a legacy index (no _geometry/) must refuse AT STREAM
    // CONSTRUCTION (the geometry is read once, not per micro-batch),
    // not silently probe at a guessed width
    graft.operators.Dedup.writeDedupIndex(corpus, "doc_id", "text", s"$base/legacy")
    val input2 = MemoryStream[EventStream.StreamDoc]
    val err = intercept[Exception] {
      EventStream.incrementalDedupContractStream(
        input2.toDF(), s"$base/legacy", s"$base/out2")
    }
    assert(err.getMessage.contains("_geometry") ||
      Option(err.getCause).exists(_.getMessage.contains("_geometry")))
  }

  test("streaming CDC upserts into a Versioned table equal the sequential batch upserts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val table = java.nio.file.Files.createTempDirectory("graft_scdc").toString + "/t"
    val input = MemoryStream[EventStream.StreamDoc]
    val q = EventStream.versionedUpsertStream(input.toDF(), table, "doc_id").start()
    input.addData(EventStream.StreamDoc(1L, "one", ts(1)), EventStream.StreamDoc(2L, "two", ts(2)))
    q.processAllAvailable()
    val midVersion = graft.operators.Versioned.latestVersion(table).get
    input.addData(EventStream.StreamDoc(2L, "two-revised", ts(3)), EventStream.StreamDoc(3L, "three", ts(4)))
    q.processAllAvailable(); q.stop()
    val latest = graft.operators.Versioned.read(spark, table)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(latest === Array((1L, "one"), (2L, "two-revised"), (3L, "three")))
    // time travel: the first batch's snapshot is intact mid-history
    val mid = graft.operators.Versioned.read(spark, table, Some(midVersion))
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(mid === Array((1L, "one"), (2L, "two")))
  }

  test("event-time timeout flushes the trailing open session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStream.UserEvent]
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val q = EventStream.customSessions(spark, input.toDF(), gapSeconds = 30,
        watermarkDelay = "10 seconds")
      .writeStream.format("memory").queryName("trailsess").outputMode("append").start()
    try {
      input.addData(EventStream.UserEvent(1L, ts(1000), "click"),
        EventStream.UserEvent(1L, ts(1010), "click"))
      q.processAllAvailable()
      // a far-later event from ANOTHER user pushes the watermark past
      // user 1's gap horizon — the open session must flush via timeout,
      // not wait forever for a user-1 event that never comes
      input.addData(EventStream.UserEvent(2L, ts(100000), "click"))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("trailsess").collect().filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length === 1)
    assert(u1.head.getAs[Long]("n_events") === 2L)
    assert(u1.head.getAs[Long]("start_ts") === 1000L)
    assert(u1.head.getAs[Long]("end_ts") === 1010L)
  }

  test("stream-stream interval join equals the batch interval join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream5").toString
    Q.events(spark, sf001).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val q = EventStream.runToMemory(spark, tmp, "attrout",
      df => EventStream.purchaseAttribution(df))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrout").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val ev = Q.events(spark, sf001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val batch = p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("checkpointed file sink is exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val ev = Q.events(spark, sf001)
    val total = ev.count()
    val firstHalf = ev.filter(col("event_id") % 2 === 0)
    val secondHalf = ev.filter(col("event_id") % 2 === 1)
    firstHalf.write.mode("overwrite").parquet(s"$base/in")
    val q1 = EventStream.runToParquet(spark, s"$base/in", s"$base/out", s"$base/ckpt",
      df => df.select(col("event_id"), col("user_id"), col("event_type")))
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$base/out").count() === firstHalf.count())
    // new files arrive; restart with the SAME checkpoint
    secondHalf.write.mode("append").parquet(s"$base/in")
    val q2 = EventStream.runToParquet(spark, s"$base/in", s"$base/out", s"$base/ckpt",
      df => df.select(col("event_id"), col("user_id"), col("event_type")))
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() === total)                    // nothing reprocessed
    assert(out.select("event_id").distinct().count() === total) // no dups
  }

  test("streaming PSI monitor: single-batch stream equals the batch operator; per-batch dirs idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("psi_stream").toString
    val ref = (0L until 400L).map(i => i % 100).toDF("vm")
    val curRows = (0L until 300L).map(i => (i * 7) % 130) // some beyond ref max

    val input = MemoryStream[Long]
    val q = graft.streaming.EventStream.psiDriftStream(
        input.toDF().select(col("value").as("vm")), ref,
        col("vm"), dir)
      .start()
    try {
      input.addData(curRows); q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/batch=0")
        .orderBy("bucket").collect().map(_.toString)
      val want = graft.operators.Features.psiDrift(ref, curRows.toDF("vm"), col("vm"))
        .collect().map(_.toString)
      assert(got.toSeq === want.toSeq)
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val dim = (0L until 10L).map(i => (i, s"seg${i % 3}")).toDF("user_id", "segment")
    val evs = (0L until 40L).map(i => EventStream.UserEvent(i % 12, ts(i), s"t${i % 4}"))

    val input = MemoryStream[EventStream.UserEvent]
    val q = EventStream.enrichStream(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      input.addData(evs.take(20)); q.processAllAvailable()
      input.addData(evs.drop(20)); q.processAllAvailable()
      val got = spark.table("enrich")
        .select("user_id", "event_type", "segment")
        .as[(Long, String, String)].collect().sorted
      val want = evs.toDF().join(dim, "user_id")
        .select("user_id", "event_type", "segment")
        .as[(Long, String, String)].collect().sorted
      // users 10/11 have no dimension row: inner-join semantics drop them
      assert(got.toSeq === want.toSeq && got.nonEmpty)
      assert(!got.exists(_._1 >= 10))
    } finally q.stop()
  }

  test("streaming checksum accumulates to the batch table checksum; batch replay is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val base = java.nio.file.Files.createTempDirectory("graft_sck").toString
    val docs = (0L until 60L).map(i => EventStream.StreamDoc(i, s"text $i", ts(i)))

    val input = MemoryStream[EventStream.StreamDoc]
    val q = EventStream.checksumStream(input.toDF(), Seq("doc_id", "text"), s"$base/state").start()
    input.addData(docs.take(25)); q.processAllAvailable()
    input.addData(docs.drop(25)); q.processAllAvailable(); q.stop()

    val (n, sum) = EventStream.checksumTotal(spark, s"$base/state")
    val batch = graft.operators.Relational
      .tableChecksum(docs.toDF(), Seq("doc_id", "text")).head()
    assert(n === batch.getAs[Long]("n_rows"))
    assert(sum === batch.getAs[Long]("checksum"))

    // replaying a batch overwrites its own dir — the total is unchanged
    graft.operators.Relational.tableChecksum(docs.take(25).toDF(), Seq("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$base/state/batch=0")
    assert(EventStream.checksumTotal(spark, s"$base/state") === ((n, sum)))
  }

  test("streaming left-outer interval join emits unmatched clicks after watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(u: Long, sec: Long, id: Long, t: String) =
      EventStream.PathEvent(u, new java.sql.Timestamp(1700000000000L + sec * 1000), id, t)
    val input = MemoryStream[EventStream.PathEvent]
    val q = EventStream.unconvertedClicks(input.toDF()).writeStream
      .format("memory").queryName("outerout")
      .outputMode(OutputMode.Append()).start()
    // user 1 converts within the hour; user 2's click never converts
    input.addData(ev(1, 0, 1, "click"), ev(1, 600, 2, "purchase"),
      ev(2, 0, 3, "click"))
    q.processAllAvailable()
    // far-future traffic on BOTH sides advances both watermarks past
    // user 2's match horizon (click + 1h + 10min delay)
    input.addData(ev(9, 14400, 90, "click"), ev(9, 14500, 91, "purchase"))
    q.processAllAvailable()
    input.addData(ev(9, 28800, 92, "click"), ev(9, 28900, 93, "purchase"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("outerout")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(rows.contains((1L, 1L, Some(2L))), rows)     // converted
    assert(rows.contains((2L, 3L, None)), rows)         // proven unmatched
    assert(!rows.contains((2L, 3L, Some(2L))), rows)    // never cross-user
  }

  test("streaming path miner emits boundary-spanning n-grams, counts equal batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(u: Long, id: Long, t: String) =
      EventStream.PathEvent(u, new java.sql.Timestamp(id * 1000), id, t)
    val b1 = Seq(ev(1, 1, "a"), ev(1, 2, "b"), ev(2, 1, "x"))
    val b2 = Seq(ev(1, 3, "a"), ev(1, 4, "b"), ev(2, 2, "y"), ev(2, 3, "x"))
    val input = MemoryStream[EventStream.PathEvent]
    val q = EventStream.pathStream(spark, input.toDF(), n = 3).writeStream
      .format("memory").queryName("pathout")
      .outputMode(OutputMode.Append()).start()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("pathout").groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a>b>a and b>a>b both SPAN the batch boundary for user 1
    assert(streamed === Map("a>b>a" -> 1L, "b>a>b" -> 1L, "x>y>x" -> 1L))
    val batch = graft.operators.Sequence.eventNgrams(
      (b1 ++ b2).toDF(), col("user_id"), Seq(col("ts"), col("event_id")),
      col("event_type"), n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
