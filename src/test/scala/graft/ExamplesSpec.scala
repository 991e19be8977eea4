package graft

import org.apache.spark.sql.functions._
import graft.examples.Examples
import graft.operators.Skew

/** Reference-example parity + skew utilities. */
class ExamplesSpec extends SparkSpec {
  import spark.implicits._

  lazy val corpus: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus")
    val text = Seq(
      "the quick brown fox", "the lazy dog", "the fox and the dog",
      "quick quick brown").mkString("\n")
    java.nio.file.Files.writeString(dir.resolve("t.txt"), text)
    dir.toString
  }

  test("typed and DataFrame wordcount agree (examples/wc.py parity)") {
    val typed = Examples.wordCountTyped(spark, corpus).collect().toMap
    val dfRes = Examples.wordCountDF(spark, corpus)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed.view.mapValues(_.toLong).toMap === dfRes)
    assert(typed("the") === 4 && typed("quick") === 3)
  }

  test("tfIdf computes log(1 + n/df) per word (tf-idf-dampr.py parity)") {
    val out = Examples.tfIdf(spark, corpus).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 4 line-docs; 'the' appears in 3 docs -> idf = ln(1 + 4/3)
    assert(math.abs(out("the") - math.log(1 + 4.0 / 3)) < 1e-12)
    assert(math.abs(out("lazy") - math.log(1 + 4.0 / 1)) < 1e-12)
  }

  test("wordStats multi-output shares one cached upstream (word-stats.py parity)") {
    val (total, top, byLen, avgLen) = Examples.wordStats(spark, corpus)
    assert(total === 15)
    assert(top.head._1 === "the" && top.head._2 === 4)
    assert(byLen.toMap.apply(3) === 9) // the*4 + fox*2 + dog*2 + and*1
    assert(math.abs(avgLen - 56.0 / 15) < 1e-12)
  }

  test("saltedAgg equals plain aggregation") {
    val df = (Seq.fill(1000)(("hot", 1)) ++ Seq(("cold", 2), ("cold", 3))).toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"), 8,
      partials = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
      finals = Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted === Array(("cold", 5L, 2L), ("hot", 1000L, 1000L)))
  }

  test("saltedJoin equals plain join") {
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("x", 7), ("y", 8))).toDF("k", "lv")
    val right = Seq(("hot", "H"), ("x", "X"), ("z", "Z")).toDF("k", "rv")
    val plain = left.join(right, "k").groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(left, right, "k", 8).groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 500L)
  }

  test("GraftCache tracks pipeline persists and releaseAll returns storage to baseline") {
    GraftCache.releaseAll() // drain any frames left by earlier suites
    def cachedRdds = spark.sparkContext.getRDDStorageInfo.length
    val baseline = cachedRdds
    val docs = graft.queries.Q.t(spark, sf001, "documents")
    graft.examples.CorpusPipeline.clean(docs).count()
    assert(GraftCache.pendingCount > 0) // exactKept + minhash sets + pairs
    val afterFirst = GraftCache.pendingCount
    // a second run in the same session accretes a second set of frames —
    // exactly the long-lived-session problem releaseAll exists for
    graft.examples.CorpusPipeline.clean(docs).count()
    assert(GraftCache.pendingCount === 2 * afterFirst)
    GraftCache.releaseAll()
    assert(GraftCache.pendingCount === 0)
    // unpersist(blocking=false) frees executor blocks asynchronously;
    // labelPropagate's eagerly-checkpointed pair RDDs are freed by the
    // ContextCleaner once unreachable, which needs a driver GC to
    // collect the weak references — nudge it while polling
    val deadline = System.currentTimeMillis + 15000
    while (cachedRdds > baseline && System.currentTimeMillis < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(cachedRdds <= baseline, s"storage grew: $baseline -> $cachedRdds cached RDDs")
  }

  test("mapValues/mapKeys/swap KV helpers") {
    import Pipe._
    val p = Pipe.memory(spark, Seq(("a", 1), ("b", 2)))
    assert(p.mapValues(_ * 10).collect().sortBy(_._1) === Array(("a", 10), ("b", 20)))
    assert(p.mapKeys(_.toUpperCase).collect().sortBy(_._1) === Array(("A", 1), ("B", 2)))
    assert(p.swap.collect().sortBy(_._1) === Array((1, "a"), (2, "b")))
  }

  test("cleanKeepBest keeps one doc per cluster with quality >= the min-label pick") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.Q.t(spark, sf001, "documents")
    val std = graft.examples.CorpusPipeline.clean(docs)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val best = graft.examples.CorpusPipeline.cleanKeepBest(docs)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same number of survivors (one per cluster both ways) and the
    // elected set's total quality can only improve on min-label picks
    assert(best.size === std.size)
    assert(best.values.sum >= std.values.sum - 1e-9)
    graft.GraftCache.releaseAll()
  }

  test("refresh commits base + kept batch rows, and REFUSES a legacy geometry-less index") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Versioned}
    import spark.implicits._
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "completely different corpus content in this document here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "The  quick brown fox jumps over the lazy dog tonight"), // exact dup after normalization
      (12L, "entirely fresh material nothing like the indexed corpus att all")
    ).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_refresh_spec").toString
    Versioned.commit(s"$base/table", corpus)
    Dedup.writeDedupIndexContract(corpus, "doc_id", "text", s"$base/idx")
    val v = graft.examples.CorpusPipeline.refresh(spark, s"$base/table", s"$base/idx", batch)
    assert(v === 1L)
    assert(Versioned.read(spark, s"$base/table").select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(0L, 1L, 12L))
    // the refresh COMPOSITION must refuse a legacy caller-trusted-
    // geometry index (no _geometry/) — probing it at a guessed width
    // is the silent-recall-loss hazard the contract closes — and the
    // refused refresh must leave no new committed version behind
    Dedup.writeDedupIndex(corpus, "doc_id", "text", s"$base/idx_legacy")
    intercept[Exception] {
      graft.examples.CorpusPipeline.refresh(spark, s"$base/table", s"$base/idx_legacy", batch)
    }
    assert(Versioned.latestVersion(s"$base/table") === Some(1L))
    graft.GraftCache.releaseAll()
  }
}
