package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Features, Quality, Sequence}

/** Laws for the data-quality/governance operators — each checked
  * against a hand-computed truth on small fixtures that exercise the
  * edge the operator exists for (nulls, orphans, skew, gaps).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns: nulls, exact distincts, native-type min/max") {
    val df = Seq[(java.lang.Long, String)]((1L, "b"), (2L, null),
      (10L, "a"), (null, "a")).toDF("k", "s")
    val p = Quality.profileColumns(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) === 4L && k.getLong(2) === 3L && k.getLong(3) === 3L)
    // min/max computed in the NATIVE type then rendered: 2 < 10
    // numerically (a string min would put "10" first)
    assert(k.getString(4) === "1" && k.getString(5) === "10")
    val s = p("s")
    assert(s.getLong(2) === 3L && s.getLong(3) === 2L)
    assert(s.getString(4) === "a" && s.getString(5) === "b")
  }

  test("fkOrphans: counts orphan rows/keys, null child keys are not orphans") {
    val child = Seq[(java.lang.Long, String)]((1L, "x"), (1L, "y"),
      (2L, "z"), (9L, "p"), (9L, "q"), (null, "n")).toDF("ck", "pay")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.fkOrphans(Seq(
      Quality.FkRel("c->p", child, "ck", parent, "pk"))).collect().head
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 6L)  // all child rows
    assert(r.getLong(2) === 3L)  // distinct non-null child keys
    assert(r.getLong(3) === 2L)  // the two key-9 rows; the null row is NOT
    assert(r.getLong(4) === 1L)  // orphan key set = {9}
  }

  test("kAnonymityProfile: group-size histogram over quasi identifiers") {
    val df = Seq((1, "A"), (1, "A"), (1, "A"), (2, "A"), (2, "A"), (3, "B"))
      .toDF("nation", "seg")
    val h = Quality.kAnonymityProfile(df, Seq(col("nation"), col("seg")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h === Map(3L -> (1L, 3L), 2L -> (1L, 2L), 1L -> (1L, 1L)))
  }

  test("keySkewProfile: exact micro shares and cumulative share") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val top = Quality.keySkewProfile(df, col("k"), topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.toSeq === Seq(("hot", 6L, 600000L, 600000L),
      ("warm", 3L, 300000L, 900000L)))
    graft.GraftCache.releaseAll()
  }

  test("autocorr: alternating series flips sign by lag parity, gaps skip") {
    // v alternates 10,20 over t=0..9: lag 1 is perfectly anti-correlated,
    // lag 2 perfectly correlated
    val s = (0 until 10).map(i => (i.toLong, if (i % 2 == 0) 10L else 20L))
      .toDF("t", "v")
    val r = Features.autocorr(s, col("t"), col("v"), maxLag = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) === ((9L, -1.0)) && r(2L) === ((8L, 1.0)))
    // a gap at t=5 removes the pairs (4,5) and (5,6), nothing else
    val g = s.filter(col("t") =!= 5)
    val rg = Features.autocorr(g, col("t"), col("v"), maxLag = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rg(1L) === 7L)
    graft.GraftCache.releaseAll()
  }

  test("eventNgrams: counts complete runs only, total order respected") {
    // user 1: a,b,a,b -> 3-grams a>b>a, b>a>b ; user 2: a,b (too short)
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b")).toDF("u", "eid", "et")
    val got = Sequence.eventNgrams(ev, col("u"), Seq(col("eid")), col("et"),
      n = 3, k = 10).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b>a" -> 1L, "b>a>b" -> 1L))
  }

  test("expectations: one scan, null predicate counts as failure") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((5L, 1L), (50L, 2L),
      (200L, 3L), (null, 4L)).toDF("qty", "id")
    val r = Quality.expectations(df, Seq(
      "qty_in_range" -> col("qty").between(1, 100),
      "id_positive" -> (col("id") > 0)))
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getLong(3),
        x.getLong(4))).toMap
    // null qty is a FAILURE, not a skip: 2 pass, 2 fail, 500000 micro
    assert(r("qty_in_range") === ((2L, 2L, 500000L)))
    assert(r("id_positive") === ((4L, 0L, 1000000L)))
  }

  test("completeness: span/present/missing and the longest gap run") {
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-05", "2024-01-09",
      "2024-01-10").map(java.sql.Date.valueOf)
    val df = days.toDF("d")
    val r = Quality.completeness(df, col("d")).collect().head
    // span 10 days, 5 present, 5 missing; longest run = Jan 6-8 (3)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((10L, 5L, 5L, 3L)))
    // a gapless feed reports max_gap_days = 0, not null
    val full = (1 to 4).map(i => java.sql.Date.valueOf(s"2024-02-0$i")).toDF("d")
    val r2 = Quality.completeness(full, col("d")).collect().head
    assert((r2.getLong(2), r2.getLong(3)) === ((0L, 0L)))
    graft.GraftCache.releaseAll()
  }

  test("lDiversityProfile: a k-safe group with one sensitive value reads l=1") {
    val df = Seq((1, "A", 10L), (1, "A", 10L), (1, "A", 10L), // big, l=1
      (2, "B", 10L), (2, "B", 20L)).toDF("nation", "seg", "sens")
    val h = Quality.lDiversityProfile(df, Seq(col("nation"), col("seg")),
        col("sens"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h === Map(1L -> ((1L, 3L)), 2L -> ((1L, 2L))))
  }

  test("fdViolations: holds vs breaks with variant counts") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (3L, "c")).toDF("k", "v")
    val r = Quality.fdViolations(df, Seq(col("k")), col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 1L, 3L)))
  }

  test("skipgramPairs: symmetric window pairs, bounded by 2w per position") {
    val seqs = Seq((1L, Seq("a", "b", "c", "d"))).toDF("sid", "toks")
    val w1 = graft.operators.Sequence.skipgramPairs(seqs, col("sid"),
        col("toks"), window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w1 === Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("c", "d") -> 1L, ("d", "c") -> 1L))
    val w2 = graft.operators.Sequence.skipgramPairs(seqs, col("sid"),
        col("toks"), window = 2)
      .agg(sum(col("n"))).head.getLong(0)
    assert(w2 === 6L + 4L) // window 2 adds (a,c),(c,a),(b,d),(d,b)
    graft.GraftCache.releaseAll()
  }

  test("q250 embedding release report: facets are internally consistent") {
    val rep = SparkEntry.queries("q250_embedding_release")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every token of every walk appears once: walkLen 3 → 4 positions
    assert(rep(("corpus", "n_tokens")) === 4L * rep(("corpus", "n_walks")))
    // the shard facet partitions the distinct-pair frame exactly
    val shardSum = rep.collect { case (("shard", _), v) => v }.sum
    assert(shardSum === rep(("pairs", "distinct")))
    // pair total ≤ 2w·Σlen with w=2 (the operator's volume contract)
    assert(rep(("pairs", "total")) <= 4L * rep(("corpus", "n_tokens")))
    graft.GraftCache.releaseAll()
  }

  test("positionAttribution: U-shaped credit, window exclusion, single-touch full") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val ev = Seq(
      (1L, ts(100), 10L, "purchase"), (1L, ts(50), 1L, "click"),
      (1L, ts(60), 2L, "click"), (1L, ts(70), 3L, "click"),
      (1L, ts(-7200), 4L, "click"), // outside the 1h window
      (2L, ts(200), 20L, "purchase"), (2L, ts(150), 5L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Sequence.positionAttribution(ev, "user_id",
        "ts", "event_type", "event_id", "purchase", "click", 3600)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === Map(
      (10L, 1L) -> ((1, 3L, 400000L)),
      (10L, 2L) -> ((2, 3L, 200000L)),
      (10L, 3L) -> ((3, 3L, 400000L)),
      (20L, 5L) -> ((1, 1L, 1000000L))))
  }

  test("upsertEvolve adds columns with null backfill; plain upsert refuses drift") {
    import graft.operators.Versioned
    val dir = java.nio.file.Files.createTempDirectory("sev_").toString + "/t"
    Versioned.commit(dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val drifted = Seq((2L, "B", 99L)).toDF("k", "v", "q")
    // plain upsert must fail loudly on the schema drift
    intercept[Exception] {
      Versioned.upsert(spark, dir, drifted, "k")
      Versioned.read(spark, dir).collect()
    }
    Versioned.upsertEvolve(spark, dir, drifted, "k")
    val got = Versioned.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(got === Map(1L -> (("a", None)), 2L -> (("B", Some(99L)))))
  }

  test("bootstrapCI: reproducible, ordered, exact on constant data") {
    val const = (1 to 200).map(i => (i.toLong, 500L)).toDF("id", "c")
    val r = Features.bootstrapCI(const, col("id"), col("c"), b = 100)
      .collect().head
    // every resample mean of a constant IS the constant
    assert(r.getLong(0) === 100L)
    assert(r.getDouble(1) === 500.0 && r.getDouble(2) === 500.0 &&
      r.getDouble(3) === 500.0)
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i => (i.toLong, 100L + rnd.nextInt(900))).toDF("id", "c")
    val a = Features.bootstrapCI(df, col("id"), col("c")).collect().head
    val b2 = Features.bootstrapCI(df, col("id"), col("c")).collect().head
    assert(a === b2) // pure function of the data
    assert(a.getDouble(2) <= a.getDouble(1) && a.getDouble(1) <= a.getDouble(3))
  }

  test("decayAttribution: exact halving buckets, shift-width refusal") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val ev = Seq(
      (1L, ts(2000), 10L, "purchase"), (1L, ts(2000), 1L, "click"),
      (1L, ts(1100), 2L, "click"), (1L, ts(199), 3L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.Sequence.decayAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", "click", 3600, 900)
      .collect().map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4))).toMap
    // gaps 0 / 900 / 1801 s -> 0 / 1 / 2 halvings
    assert(got === Map(1L -> ((0L, 1000000L)), 2L -> ((900L, 500000L)),
      3L -> ((1801L, 250000L))))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Sequence.decayAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", "click",
        windowSec = 86400L * 365, halfLifeSec = 60)
    }
    assert(ex.getMessage.contains("halvings"))
  }

  test("cosinePairs: co/sqrt(na*nb), support and pair floors hold") {
    // items x,y co-occur in 2 of x's 3 / y's 2 baskets -> cos = 2/sqrt(6)
    val inc = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (1L, "z"), (2L, "z"), (3L, "z"), (4L, "z")).toDF("b", "i")
    val got = Curation.cosinePairs(inc, col("b"), col("i"),
      minSupport = 2, minPair = 2, maxPerBasket = 8, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5))
      .toMap
    assert(got(("x", "y")) ===
      BigDecimal(2.0 / math.sqrt(6.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    // z co-occurs with x,y in baskets 1-3 as well
    assert(got(("x", "z")) ===
      BigDecimal(3.0 / math.sqrt(12.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    graft.GraftCache.releaseAll()
  }
}
