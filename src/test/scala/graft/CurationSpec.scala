package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Specs for the curation operators (chunk dedup, decontamination,
  * packing, stratified sampling, repetition stats) on crafted inputs
  * with exact expectations, plus the Bloom-prefilter ≡ exact-join
  * equivalence that backs the q83 "exact result" claim.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 12-token bodies so k=4 chunking yields 3 full chunks per doc.
  private val boiler = "one two three four"
  def docsDf = Seq(
    (0L, s"$boiler alpha beta gamma delta epsilon zeta eta theta", "en", "ref"),
    (1L, s"$boiler iota kappa lambda mu nu xi omicron pi", "en", "ref"),
    (2L, s"rho sigma tau upsilon $boiler phi chi psi omega", "es", "held"),
    (3L, "aa bb cc dd ee ff gg hh ii jj kk ll", "en", "held"),
    (4L, "short text", "en", "held")
  ).toDF("doc_id", "text", "lang", "source")

  test("chunkFingerprints emits only full k-token chunks") {
    val fps = Curation.chunkFingerprints(docsDf, "doc_id", "text", 4)
    assert(fps.filter(col("doc_id") === 4L).count() === 0) // 2 tokens < k
    assert(fps.filter(col("doc_id") === 0L).count() === 3) // 12 tokens / 4
  }

  test("chunkDupGroups finds the chunk-aligned boilerplate copies only") {
    val groups = Curation.chunkDupGroups(docsDf, "doc_id", "text", 4).collect()
    // docs 0,1 lead with the boilerplate; doc 2 carries it chunk-ALIGNED
    // at token offset 4 so it groups too (stride-k chunking only
    // detects aligned repeats — that's the documented tradeoff vs the
    // overlapping winnowed fingerprints of q75)
    assert(groups.length === 1)
    val g = groups.head
    assert(g.getAs[Long]("n_docs") === 3L)
    assert(g.getAs[Long]("n_occurrences") === 3L)
    assert(g.getAs[Long]("keep_id") === 0L)
  }

  test("shingleOverlap scores a benchmark copy at 1.0 and unrelated text below threshold") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog", "b")).toDF("doc_id", "text", "src")
    val held = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "h"), // verbatim copy
      (1L, "the quick brown fox leaps over the lazy dog", "h"), // 1-token edit
      (2L, "completely different words entirely unrelated text here now", "h")
    ).toDF("doc_id", "text", "src")
    val out = Curation.shingleOverlap(bench.union(held), col("src") === "b", "doc_id", "text", 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("overlap")).toMap
    assert(out(0L) === 1.0)
    assert(out.contains(1L) && out(1L) > 0.3 && out(1L) < 1.0)
    assert(!out.contains(2L))
  }

  test("crossSourceDupMatrix counts shared chunk fingerprints with min-side rate") {
    // ref/ref share nothing; docs 0 (ref) and 2 (held) share the
    // aligned boilerplate chunk → exactly one overlapping fp
    val out = Curation.crossSourceDupMatrix(docsDf, "text", "source", 4).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source_a") === "held" && r.getAs[String]("source_b") === "ref")
    assert(r.getAs[Long]("shared_fps") === 1L)
    // held has 6 distinct chunk fps (docs 2,3; doc 4 too short), ref 5
    // (6 chunks, boilerplate shared) → rate = 1/5
    assert(r.getAs[Double]("overlap_rate") === 0.2)
    graft.GraftCache.releaseAll()
  }

  test("decontaminateByChunks equals the plain exact anti-join (Bloom only prunes)") {
    val ref = col("source") === "ref"
    val got = Curation.decontaminateByChunks(docsDf, ref, "doc_id", "text", 4)
      .as[Long].collect().sorted
    // plain exact form: held docs sharing no chunk fp with the ref partition
    val refFps = Curation.chunkFingerprints(docsDf.filter(ref), "doc_id", "text", 4).select("fp")
    val contaminated = Curation.chunkFingerprints(docsDf.filter(!ref), "doc_id", "text", 4)
      .join(refFps, Seq("fp"), "left_semi").select("doc_id").distinct()
    val expected = docsDf.filter(!ref).select(col("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti").as[Long].collect().sorted
    assert(got === expected)
    assert(got === Array(3L, 4L)) // doc 2 carries the ref boilerplate chunk; 4 has no chunks
    GraftCache.releaseAll()
  }

  test("packBins lays docs end to end and bins by starting offset") {
    val d = Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L), (4L, "a", 100L), (5L, "b", 700L))
      .toDF("id", "grp", "w")
    val out = Curation.packBins(d, Seq(col("grp")), col("id"), col("w"), 256L)
      .select(col("id"), col("bin")).as[(Long, Long)].collect().toMap
    // starts at 0,100,200,300 -> bins 0,0,0,1; stratum b independent at 0
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("stratifiedSample is a deterministic subset honoring per-stratum rates") {
    val df = spark.range(2000).select(col("id"), (col("id") % 2).as("grp"))
    val rate = when(col("grp") === 0, 50).otherwise(5)
    val a = Curation.stratifiedSample(df, "id", rate).as[(Long, Long)].collect().toSet
    val b = Curation.stratifiedSample(df, "id", rate).as[(Long, Long)].collect().toSet
    assert(a === b) // reproducible
    val byGrp = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGrp(0L) > 400 && byGrp(0L) < 600) // ~50% of 1000
    assert(byGrp(1L) > 20 && byGrp(1L) < 100)  // ~5% of 1000
  }

  test("vocabTopK ranks tokens per stratum with complete tie-breaks") {
    val d = Seq((1L, "a", "x x y z"), (2L, "a", "x y y"), (3L, "b", "q q q")).toDF("id", "grp", "text")
    val out = Curation.vocabTopK(d, "grp", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // grp a: x=3, y=3 tie broken by token asc; z=1 cut by k=2
    assert(out === Set(("a", "x", 3L), ("a", "y", 3L), ("b", "q", 3L)))
  }

  test("lengthHistogram buckets token counts per stratum") {
    val d = Seq((1L, "a", "one two three"), (2L, "a", "one two"), (3L, "a", Seq.fill(20)("w").mkString(" ")))
      .toDF("id", "grp", "text")
    val out = Curation.lengthHistogram(d, "grp", "text", 16)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", 0L)) === ((2L, 5L)))  // 3-token + 2-token docs
    assert(out(("a", 1L)) === ((1L, 20L))) // the 20-token doc
  }

  test("mixtureResample keeps small sources whole and downsamples the dominant one") {
    // source "big" has ~10x the tokens of each small source -> rate
    // (total/3)/big_tok < 1; small sources get rate 1.0 (kept whole)
    val rows = (1L to 200L).map(i => (i, "big", "w w w w w w w w w w")) ++
      (201L to 220L).map(i => (i, "s1", "w w w w w w w w w w")) ++
      (221L to 240L).map(i => (i, "s2", "w w w w w w w w w w"))
    val d = rows.toDF("doc_id", "source", "text")
    val kept = Curation.mixtureResample(d, "source", "doc_id", "text")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("s1") === 20 && bySrc("s2") === 20) // rate 1.0
    // target share = 2400/3 = 800 tokens = 80 docs; hash sampling is approximate
    assert(bySrc("big") > 40 && bySrc("big") < 120, bySrc.toString)
    // deterministic
    val again = Curation.mixtureResample(d, "source", "doc_id", "text")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    assert(kept.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("percentileGate keeps rows at or above the per-stratum quantile") {
    val d = Seq(("a", 1L, 0.1), ("a", 2L, 0.5), ("a", 3L, 0.9),
      ("b", 4L, 0.2), ("b", 5L, 0.8)).toDF("grp", "id", "v")
    val out = Curation.percentileGate(d, "grp", "v", 0.5)
      .select(col("id")).as[Long].collect().sorted
    // medians: a -> 0.5 (keeps 2,3), b -> 0.5 interpolated (keeps 5)
    assert(out === Array(2L, 3L, 5L))
  }

  test("bpePairCounts counts adjacent pieces with punctuation as its own piece") {
    val d = Seq((1L, "a b, a b"), (2L, "a b")).toDF("id", "text")
    val out = Curation.bpePairCounts(d, "text", 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pieces doc1: a b , a b ; doc2: a b
    assert(out(("a", "b")) === 3L)
    assert(out(("b", ",")) === 1L)
    assert(out((",", "a")) === 1L)
  }

  test("unigramLogProb scores frequent-token docs higher than rare-token docs") {
    val d = Seq((1L, "x x x x"), (2L, "x x y z")).toDF("doc_id", "text")
    val out = Curation.unigramLogProb(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // x: 6/8, y: 1/8, z: 1/8
    val lx = math.log(6.0 / 8); val ly = math.log(1.0 / 8)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 === 4 && math.abs(out(1L)._2 - r6(lx)) < 1e-6)
    assert(out(2L)._2 < out(1L)._2) // rare tokens pull the mean down
    assert(math.abs(out(2L)._2 - r6((2 * r6(lx) + 2 * r6(ly)) / 4)) < 2e-6)
  }

  test("CurationPipeline.prepare composes gate -> decontam -> mixture -> packing") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val ref = col("source").isin("src0", "src1")
    val out = graft.examples.CurationPipeline.prepare(docs, ref)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // no reference docs survive, and every output doc is a held-out doc
    val refIds = docs.filter(ref).select("doc_id").as[Long].collect().toSet
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.toSet.intersect(refIds).isEmpty)
    assert(ids.distinct.length === ids.length)
    // bins are contiguous non-negative indices within each lang
    assert(rows.forall(_.getAs[Long]("bin") >= 0L))
    // deterministic end to end
    val again = graft.examples.CurationPipeline.prepare(docs, ref).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    GraftCache.releaseAll()
  }

  test("repetitionStats computes exact top/distinct ratios") {
    val d = Seq((1L, "a a a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = Curation.repetitionStats(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Double]("top_ratio"), r.getAs[Double]("distinct_ratio")))).toMap
    assert(out(1L) === ((4, 0.75, 0.5)))
    assert(out(2L) === ((4, 0.25, 1.0)))
  }

  test("bpeTrain learns hand-checkable merges in frequency order") {
    // vocab: "abab" x3, "ab" x2, "cd" x1
    // step 1: pairs weighted by word freq — (a,b): 2*3 + 1*2 = 8 wins
    // step 2: after splice, "ab ab" yields (ab,ab): 3; (c,d): 1 → ab ab
    // step 3: only (c,d): 1 remains
    val d = Seq((1L, "abab abab abab ab ab cd")).toDF("doc_id", "text")
    val m = Curation.bpeTrain(d, "text", topV = 10, steps = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m.toSeq === Seq((1, "a b", 8L), (2, "ab ab", 3L), (3, "c d", 1L)))
    // overlap semantics: "aaa" merges leftmost-non-overlapping
    val o = Curation.bpeTrain(Seq((1L, "aaa")).toDF("doc_id", "text"), "text", 10, 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(o.toSeq === Seq(("a a", 2L)))
  }
}
