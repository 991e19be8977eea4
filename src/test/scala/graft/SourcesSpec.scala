package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.TsvTap

/** Custom-source and sink specs (SURVEY §2.1 `read_input` custom taps,
  * §2.7 tsv/json sinks, §2.9 index retrieval).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("RangeTap DSv2 source generates partitioned deterministic rows") {
    val df = spark.read.format("graft.sources.RangeTap")
      .option("rows", "100").option("partitions", "8").load()
    assert(df.count() === 100)
    assert(df.rdd.getNumPartitions === 8)
    val r = df.filter(col("id") === 7).collect().head
    assert(r.getLong(1) === 15) // value = id * 2 + 1
  }

  test("RangeTap handles rows < partitions") {
    val df = spark.read.format("graft.sources.RangeTap")
      .option("rows", "3").option("partitions", "8").load()
    assert(df.count() === 3)
  }

  test("sinkTsv round-trips tab-separated tuples") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv").toString + "/out"
    Pipe.memory(spark, Seq(("a", 1), ("b", 2))).sinkTsv(dir)
    val back = spark.read.option("sep", "\t").csv(dir)
      .collect().map(r => (r.getString(0), r.getString(1).toInt)).sortBy(_._1)
    assert(back === Array(("a", 1), ("b", 2)))
  }

  test("sinkJson round-trips records") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString + "/out"
    Pipe.memory(spark, Seq(("x", 10), ("y", 20))).sinkJson(dir)
    val back = Tables.json(spark, dir)
      .select(col("_1"), col("_2")).as[(String, Long)].collect().sortBy(_._1)
    assert(back === Array(("x", 10L), ("y", 20L)))
  }

  test("indexUnion retrieves docs matching any probe token") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "delta")).toDF("doc_id", "text")
    val idx = Relational.invertedIndex(docs, "doc_id", "text")
    val hits = Relational.indexUnion(idx, Seq("alpha", "gamma")).as[Long].collect().sorted
    assert(hits === Array(1L, 2L))
  }

  test("UrlsTap streams lines per URL partition, skipping bad URLs") {
    val d = java.nio.file.Files.createTempDirectory("graft_urls")
    java.nio.file.Files.writeString(d.resolve("a.txt"), "a1\na2")
    java.nio.file.Files.writeString(d.resolve("b.txt"), "b1")
    val urls = Seq(s"file://$d/a.txt", s"file://$d/b.txt", s"file://$d/missing.txt")
    val df = spark.read.format("graft.sources.UrlsTap")
      .option("urls", urls.mkString(",")).load()
    assert(df.rdd.getNumPartitions === 3)
    val lines = df.collect().map(r => (r.getString(0).split("/").last, r.getString(1)))
    assert(lines.sorted === Array(("a.txt", "a1"), ("a.txt", "a2"), ("b.txt", "b1")))
  }

  test("UrlsTap skipOnError=false fails on a bad URL") {
    val df = spark.read.format("graft.sources.UrlsTap")
      .option("urls", "file:///nonexistent_graft_url.txt")
      .option("skipOnError", "false").load()
    intercept[org.apache.spark.SparkException](df.count())
  }

  test("TsvTap sink round-trips hostile strings, nulls and atomic types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap").toString + "/out"
    val rows = Seq(
      (1L, "tab\there", Some(1.5)),
      (2L, "line\nbreak \r and back\\slash", None),
      (3L, "\\N literal backslash-N", Some(-0.25)),
      (4L, null.asInstanceOf[String], Some(0.0)))
    val df = rows.toDF("id", "s", "d")
    df.write.format("graft.sources.TsvTap").option("path", dir)
      .mode("append").save()
    val back = spark.read.format("graft.sources.TsvTap").option("path", dir)
      .option("schema", "id BIGINT, s STRING, d DOUBLE").load()
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(back.toSeq === rows)
  }

  test("TsvTap commit protocol: _SUCCESS stamped, staging swept, stray attempts never promoted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap2").resolve("out")
    // a stale staging file from a "failed attempt" of some earlier job
    java.nio.file.Files.createDirectories(dir.resolve("_temp"))
    java.nio.file.Files.writeString(dir.resolve("_temp").resolve("attempt-99-99.tsv"), "999\tGHOST\n")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").repartition(2)
      .write.format("graft.sources.TsvTap").option("path", dir.toString)
      .mode("overwrite").save()
    assert(java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
    assert(!java.nio.file.Files.exists(dir.resolve("_temp")))
    val back = spark.read.format("graft.sources.TsvTap").option("path", dir.toString)
      .option("schema", "id BIGINT, s STRING").load()
    // one input split per committed part file; the ghost row is gone
    assert(back.rdd.getNumPartitions === 2)
    assert(back.collect().map(_.getString(1)).sorted === Array("a", "b"))
  }

  test("TsvTap pushes column pruning into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap4").toString + "/out"
    Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "s", "d")
      .write.format("graft.sources.TsvTap").option("path", dir).mode("append").save()
    val pruned = spark.read.format("graft.sources.TsvTap").option("path", dir)
      .option("schema", "id BIGINT, s STRING, d DOUBLE").load()
      .select("d")
    // DSv2 BatchScan prints its pruned output attrs: only `d` may
    // survive into the scan
    val p = pruned.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("BatchScan")).getOrElse(p)
    assert(scanLine.contains("[d#") && !scanLine.contains("id#") && !scanLine.contains("s#"), p)
    assert(pruned.collect().map(_.getDouble(0)).sorted === Array(0.5, 1.5))
  }

  test("TsvTap pushes filters into the scan and keeps residual semantics exact") {
    import org.apache.spark.sql.{sources => sqlsrc}
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL("id BIGINT, s STRING, d DOUBLE")
    // raw-cell evaluator unit laws (null cell = \N)
    def cells(id: String, s: String, d: String) = Array(id, s, d)
    assert(TsvTap.evalFilter(sqlsrc.GreaterThan("id", 1L), cells("2", "x", "0.5"), schema))
    assert(!TsvTap.evalFilter(sqlsrc.GreaterThan("id", 2), cells("2", "x", "0.5"), schema))
    assert(TsvTap.evalFilter(sqlsrc.EqualTo("s", "tab\there"), cells("1", "tab\\there", "0"), schema))
    assert(!TsvTap.evalFilter(sqlsrc.IsNotNull("s"), cells("1", "\\N", "0"), schema))
    assert(TsvTap.evalFilter(sqlsrc.IsNull("s"), cells("1", "\\N", "0"), schema))
    // comparisons against null cells are false (SQL three-valued logic
    // collapses to "don't emit" at the scan)
    assert(!TsvTap.evalFilter(sqlsrc.GreaterThan("d", 0), cells("1", "x", "\\N"), schema))

    // end to end: filtered read returns exactly the SQL-semantics rows
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap5").toString + "/out"
    Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, null.asInstanceOf[String], 2.5))
      .toDF("id", "s", "d")
      .write.format("graft.sources.TsvTap").option("path", dir).mode("append").save()
    val got = spark.read.format("graft.sources.TsvTap").option("path", dir)
      .option("schema", "id BIGINT, s STRING, d DOUBLE").load()
      .filter(col("d") > 0.5 && col("s").isNotNull)
      .select("id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L))
  }

  test("TsvTap answers bare COUNT(*) from line counts (aggregate pushdown)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap6").toString + "/out"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").repartition(2)
      .write.format("graft.sources.TsvTap").option("path", dir).mode("append").save()
    val df = spark.read.format("graft.sources.TsvTap").option("path", dir)
      .option("schema", "id BIGINT, s STRING").load()
    val counted = df.groupBy().count()
    // the scan emits pre-counted longs, not rows
    val scanLine = counted.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.toLowerCase.contains("count"), scanLine)
    assert(counted.head.getLong(0) === 3L)
    // a filtered count must NOT take the pushed path (filters here are
    // advisory residuals) — and must still be exact
    assert(df.filter(col("id") > 1L).count() === 2L)
  }

  test("TsvTap overwrite truncates prior committed output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsvtap3").toString + "/out"
    Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "s").repartition(3)
      .write.format("graft.sources.TsvTap").option("path", dir)
      .mode("append").save()
    Seq((10L, "new")).toDF("id", "s").coalesce(1)
      .write.format("graft.sources.TsvTap").option("path", dir)
      .mode("overwrite").save()
    val back = spark.read.format("graft.sources.TsvTap").option("path", dir)
      .option("schema", "id BIGINT, s STRING").load().collect()
    assert(back.map(_.getString(1)).toSeq === Seq("new"))
  }
}
