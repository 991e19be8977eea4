package graft

/** Dampr-parity tests over the typed Pipe DSL. Each test mirrors a
  * reference test's inputs and expected outputs (FIXTURES.md §1 maps
  * fixtures to `/root/reference/tests/test_dampr.py` lines). Outputs
  * are sorted before comparison — the reference's key-sorted output
  * order is an engine artifact we don't replicate (SURVEY.md §7.3).
  */
class PipeSpec extends SparkSpec {
  import spark.implicits._

  def ints: Pipe[Int] = Pipe.memory(spark, 10 until 20, partitions = 2)
  def ints2: Pipe[Int] = Pipe.memory(spark, 0 until 10, partitions = 2)

  // tests/test_dampr.py:23-29 (identity read)
  test("memory source round-trips") {
    assert(ints.collect().sorted === (10 until 20).toArray)
  }

  // tests/test_dampr.py:63-69 (map + filter)
  test("map and filter fuse and apply") {
    val out = ints.map(_ * 2).filter(_ % 4 == 0).collect().sorted
    assert(out === Array(20, 24, 28, 32, 36))
  }

  // tests/test_dampr.py:46-61 (group_by + reduce sums, odd/even keys)
  test("groupBy with general reduce") {
    val out = ints.groupBy(_ % 2).reduce((k, it) => (k, it.sum)).collect().sortBy(_._1)
    assert(out === Array((0, 10 + 12 + 14 + 16 + 18), (1, 11 + 13 + 15 + 17 + 19)))
  }

  // tests/test_dampr.py:108-116 (associative reduce via a_group_by)
  test("aGroupBy fold with binop") {
    val out = ints.aGroupBy(_ % 2).fold(_ + _).collect().sortBy(_._1)
    assert(out === Array((0, 70), (1, 75)))
  }

  // tests/test_dampr.py:161-168 (fold_by)
  test("foldBy shortcut") {
    val out = ints.foldBy(_ % 2)(_ + _).collect().sortBy(_._1)
    assert(out === Array((0, 70), (1, 75)))
  }

  // dampr/dampr.py:455-457 (mean doctest: ages fixture)
  test("meanBy computes grouped mean with (sum,count) aggregator") {
    val ages = Pipe.memory(spark, Seq(("Andrew", 33), ("Alice", 42), ("Andrew", 12), ("Bob", 51)))
    val out = ages.meanBy(_._1)(_._2.toDouble).collect().sortBy(_._1)
    assert(out === Array(("Alice", 42.0), ("Andrew", 22.5), ("Bob", 51.0)))
  }

  // dampr/dampr.py:731-733 (unique doctest: names fixture)
  test("unique keeps distinct values per key") {
    val names = Pipe.memory(spark, Seq(("Andrew", 1), ("Andrew", 1), ("Andrew", 2), ("Becky", 13)))
    val out = names.groupBy(_._1).unique(_._2).map { case (k, vs) => (k, vs.sorted) }
      .collect().sortBy(_._1)
    assert(out === Array(("Andrew", Seq(1, 2)), ("Becky", Seq(13))))
  }

  // tests/test_dampr.py:439-448-style count
  test("countBy counts per key") {
    val letters = Pipe.memory(spark, "supercalifragilisticexpialidociousa".map(_.toString))
    val out = letters.countBy(identity).collect().toMap
    assert(out("a") === 4L && out("i") === 7L && out("s") === 3L)
  }

  // tests/test_dampr.py:75-106 (inner join incl. disjoint keys)
  test("cogroup-shaped inner join") {
    val l = Pipe.memory(spark, Seq(("foo", 13), ("bar", 14)))
    val r = Pipe.memory(spark, Seq(("bar", "baller"), ("baz", "bag")))
    val out = l.joinOn(r)(_._1, _._1)
      .reduce((k, lit, rit) => (k, lit.map(_._2).sum, rit.map(_._2).mkString(",")))
      .collect()
    assert(out === Array(("bar", 14, "baller")))
  }

  // dampr/dampr.py:797-801 (many=True flattening)
  test("flatReduce flattens join output") {
    val l = Pipe.memory(spark, Seq((1, "a"), (1, "b"), (2, "c")))
    val r = Pipe.memory(spark, Seq((1, 10), (1, 20)))
    val out = l.joinOn(r)(_._1, _._1)
      .flatReduce((k, lit, rit) => {
        val rs = rit.map(_._2).toList
        lit.flatMap(x => rs.map(y => (x._2, y)))
      }).collect().sorted
    assert(out === Array(("a", 10), ("a", 20), ("b", 10), ("b", 20)))
  }

  // tests/test_dampr.py:118-130 (left join as anti-join idiom)
  test("leftReduce exposes empty right iterators (anti-join idiom)") {
    val evens = ints.filter(_ % 2 == 0)
    val out = ints.joinOn(evens)(identity, identity)
      .leftReduce((k, _, rit) => (k, rit.isEmpty))
      .collect().filter(_._2).map(_._1).sorted
    assert(out === Array(11, 13, 15, 17, 19))
  }

  test("fullReduce covers both-sided and one-sided keys") {
    val l = Pipe.memory(spark, Seq((1, "a"), (2, "b")))
    val r = Pipe.memory(spark, Seq((2, "x"), (3, "y")))
    val out = l.joinOn(r)(_._1, _._1)
      .fullReduce((k, lit, rit) => (k, lit.nonEmpty, rit.nonEmpty))
      .collect().sortBy(_._1)
    assert(out === Array((1, true, false), (2, true, true), (3, false, true)))
  }

  // tests/test_dampr.py:211-237 (cross joins with broadcast side)
  test("crossLeft broadcasts the right side") {
    val out = ints2.crossLeft(Pipe.memory(spark, Seq(100, 200)))((a, b) => a + b).collect()
    assert(out.length === 20)
    assert(out.sorted.head === 100 && out.sorted.last === 209)
  }

  // dampr/dampr.py:543-564 (cross_right: left side broadcast, right drives)
  test("crossRight broadcasts the left side over the right") {
    val out = Pipe.memory(spark, Seq(100, 200)).crossRight(ints2)((a, b) => a + b).collect()
    assert(out.length === 20)
    assert(out.sorted.head === 100 && out.sorted.last === 209)
  }

  // dampr/dampr.py:590-619 (cross_set aggregate broadcast)
  test("crossSet passes whole aggregated right side") {
    val out = ints2.crossSet(Pipe.memory(spark, Seq(1, 2, 3)))(_.toSet)((t, s) => (t, s.size)).collect()
    assert(out.length === 10 && out.forall(_._2 == 3))
  }

  // driver-OOM guard on the memory=True cross ops
  test("cross ops refuse an oversized broadcast side") {
    spark.conf.set("graft.cross.maxRows", "5")
    try intercept[IllegalArgumentException] {
      ints.crossLeft(ints2)((a, b) => a + b)
    } finally spark.conf.unset("graft.cross.maxRows")
  }

  // tests/test_dampr.py:71-73 (sort)
  test("sortBy orders globally") {
    assert(ints.sortBy(x => -x).collect() === (10 until 20).reverse.toArray)
  }

  // tests/test_dampr.py:403-413 (topk)
  test("topk returns k largest by score") {
    assert(ints.topk(3)(identity) === Seq(19, 18, 17))
  }

  // tests/test_dampr.py:332-338 (len of empty), :170-181 (empty-input ops)
  test("empty input is safe across ops") {
    val empty = Pipe.memory(spark, Seq.empty[Int])
    assert(empty.len() === 0L)
    assert(empty.foldBy(_ % 2)(_ + _).collect().isEmpty)
    assert(empty.topk(3)(identity).isEmpty)
  }

  // tests/test_dampr.py:475-527 (prefix/suffix tuple helpers)
  test("prefix and suffix build kv pairs") {
    val p = Pipe.memory(spark, Seq(5, 6)).prefix(_ % 2).collect().sortBy(_._2)
    assert(p === Array((1, 5), (0, 6)))
    val sfx = Pipe.memory(spark, Seq(5, 6)).suffix(_ * 10).collect().sortBy(_._1)
    assert(sfx === Array((5, 50), (6, 60)))
  }

  // dampr/dampr.py:114-126 (sample; ours is seeded — SURVEY §7.3)
  test("sample(0.0) is empty, sample is deterministic under a seed") {
    assert(ints.sample(0.0).collect().isEmpty)
    val a = ints.sample(0.5, seed = 7L).collect()
    val b = ints.sample(0.5, seed = 7L).collect()
    assert(a === b)
  }

  // dampr/dampr.py:201-222 (partition_map)
  test("partitionMap runs once per partition") {
    val out = ints.partitionMap(it => Iterator.single(it.length)).collect()
    assert(out.sum === 10)
    assert(out.length === ints.ds.rdd.getNumPartitions)
  }

  // tests/test_dampr.py:529-545 (filter_by_count via utils) — typed path
  test("filter_by_count idiom via countBy + join") {
    val words = Pipe.memory(spark,
      Seq("one", "two", "three", "four", "five", "six", "seven", "eight", "nine", "ten"))
    val counts = words.countBy(_.length)
    val kept = words.joinOn(counts.filter(_._2 >= 4))(_.length, _._1)
      .flatReduce((_, lit, _) => lit.toList)
      .collect().sorted
    // length-3 words are the only group with count >= 4
    assert(kept === Array("one", "six", "ten", "two"))
  }

  // examples/word-stats.py:40-41 (multi-output shared DAG via cache)
  test("cached subgraph feeds multiple outputs") {
    val letters = Pipe.memory(spark, "aabbbcc".map(_.toString)).cached()
    val total = letters.len()
    val perKey = letters.countBy(identity).collect().toMap
    assert(total === 7L && perKey("b") === 3L)
  }

  // tests/test_dampr.py:183-196 (sink + re-read)
  test("sinkText writes lines that re-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/out"
    ints.map(_.toString).sinkText(dir)
    val back = Tables.text(spark, dir).collect().map(_.toInt).sorted
    assert(back === (10 until 20).toArray)
  }

  // dampr/dampr.py:822-829 (per-key cross product)
  test("JoinedPipe.cross crosses values within matching keys") {
    val l = Pipe.memory(spark, Seq((1, "a"), (1, "b"), (2, "c")))
    val r = Pipe.memory(spark, Seq((1, 10), (1, 20), (3, 30)))
    val out = l.joinOn(r)(_._1, _._1).cross((x, y) => (x._2, y._2)).collect().sorted
    assert(out === Array(("a", 10), ("a", 20), ("b", 10), ("b", 20)))
  }

  // dampr/dampr.py:128-153 (checkpoint stage boundary)
  test("checkpoint truncates lineage without changing results") {
    val p = ints.map(_ * 3).checkpoint().filter(_ % 2 == 0)
    assert(p.collect().sorted === (10 until 20).map(_ * 3).filter(_ % 2 == 0).toArray)
  }

  // dampr/dampr.py:34-42 (ValueEmitter.read(k)) and :469-484 (inspect)
  test("read(k) takes k values; inspect passes through unchanged") {
    assert(ints.read(3).length === 3)
    assert(ints.inspect("dbg: ").collect().sorted === (10 until 20).toArray)
  }

  // dampr/dampr.py:469-484: the reference's inspect STREAMS records as
  // the stage runs — building the pipeline must not trigger a job. An
  // eager tap would execute the throwing map at construction; the lazy
  // one only fails when an action actually runs the plan.
  test("inspect is lazy: no job at construction, tap runs with the action") {
    val poisoned = ints.map[Int](_ => throw new RuntimeException("ran eagerly"))
    val tapped = poisoned.inspect("dbg: ") // must not throw
    intercept[Exception](tapped.collect()) // the action does run (and hits the poison)
  }

  // dampr/dampr.py:479-482 (inspect(exit=True) aborts after printing)
  test("inspect(exit=true) invokes the process-exit hook") {
    val saved = Pipe.exitHook
    var code = -1
    try {
      Pipe.exitHook = c => code = c
      ints.inspect("dbg: ", exit = true)
      assert(code === 0)
    } finally Pipe.exitHook = saved
  }

  test("observed metrics ride the action's own scan: no extra job, mid-pipeline tallies") {
    import org.apache.spark.sql.functions._
    val ints = Pipe.memory(spark, 1 to 1000)
    val (tapped, obs) = ints.filter(_ % 2 == 0)
      .observed("evens", count(lit(1)).as("n"), sum(col("value")).as("total"))
    val out = tapped.map(_ * 10).ds.collect()
    assert(out.length === 500 && out.sum === 2505000)
    val m = obs.get
    assert(m("n") === 500L)
    assert(m("total") === 250500L)
  }
}
