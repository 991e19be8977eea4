package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

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
}
