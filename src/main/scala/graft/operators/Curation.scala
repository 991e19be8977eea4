package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Training-data curation operators beyond near-dup detection: chunk
  * (paragraph-level) boilerplate dedup, benchmark decontamination,
  * sequence packing, stratified sampling, and repetition scoring — the
  * pipeline stages between "raw crawl" and "training batches" that the
  * reference's word-count/tf-idf examples gesture at
  * (`/root/reference/examples/wc.py`, `benchmarks/tf-idf-dampr.py`)
  * re-expressed as declarative Spark plans.
  *
  * Scale notes live per-operator; the common theme is that every
  * shuffle key here is a fingerprint or a stratum, never a document
  * body, and reference sets (benchmark shingles, contaminated-chunk
  * fingerprints) ride broadcast or Bloom-filter side channels instead
  * of shuffling the corpus.
  */
object Curation {

  /** (doc_id, fp) for every full non-overlapping `k`-token chunk of
    * each document: the unit of paragraph-level dedup (Dolma/RefinedWeb
    * style) on a corpus whose documents carry no structural paragraph
    * breaks. The chunking runs as a typed flatMap (same rationale as
    * [[Dedup.shingleHashes]]: sliding/grouped windows beat higher-order
    * array functions, which drop out of whole-stage codegen); the md5
    * stays an expression. Documents shorter than `k` tokens emit no
    * chunks. The shuffle-facing output is a 32-char fingerprint, never
    * the chunk text.
    */
  def chunkFingerprints(docs: DataFrame, idCol: String, textCol: String, k: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val tk = graft.functions.Tokenize.closure(text)
        tk.grouped(k).withFilter(_.length == k).map(c => (id, c.mkString(" ")))
      }
      .toDF("doc_id", "chunk")
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
  }

  /** Chunk-level duplicate groups: every `k`-token chunk fingerprint
    * appearing in at least two distinct documents, with its document
    * count, total occurrence count, and the minimum containing doc_id —
    * the boilerplate-detection shape (navigation chrome, license
    * headers, templated spam) that document-level dedup misses. One
    * hash aggregate over (fp); at 100 TB the shuffle carries 32-byte
    * fingerprints and the aggregate is map-side combined.
    */
  def chunkDupGroups(docs: DataFrame, idCol: String, textCol: String, k: Int = 16): DataFrame =
    chunkFingerprints(docs, idCol, textCol, k)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") >= 2)

  /** Benchmark-contamination scoring (GPT-3 appendix-C style): for each
    * held-out document, the fraction of its distinct hashed 3-token
    * shingles that appear anywhere in the benchmark partition
    * (`benchCol` = true). Returns docs at or above `threshold` with
    * (n_shingles, n_hits, overlap).
    *
    * Scale shape: the benchmark shingle set is DISTINCT'd and
    * explicitly broadcast — benchmark suites are MBs against a 100 TB
    * corpus — so the overlap join is a map-side broadcast hash join;
    * the corpus-side aggregate is map-side combined on doc_id. Shingle
    * hashing shares [[Dedup.shingleHashes]] (31-bit md5-derived h31),
    * so overlap is computed on longs, not strings.
    */
  def shingleOverlap(docs: DataFrame, benchCol: Column, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val bench = broadcast(
      Dedup.shingleHashes(docs.filter(benchCol), idCol, textCol)
        .select(col("h")).distinct().withColumn("hit", lit(1)))
    Dedup.shingleHashes(docs.filter(!benchCol), idCol, textCol)
      .distinct()
      .join(bench, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .withColumn("overlap",
        round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6))
      .filter(col("overlap") >= threshold)
  }

  /** Exact chunk-level decontamination with a Bloom prefilter: drop
    * every held-out (`!refCol`) document sharing at least one full
    * `k`-token chunk with the reference partition (`refCol` = true —
    * "already trained on"), keep the rest. The result is EXACT: the
    * Bloom filter only prunes, and its false positives are killed by an
    * exact join before any document is dropped.
    *
    * Scale shape: a reference set too large to broadcast exactly still
    * fits a Bloom filter (~1.2 GB per 10^9 chunks at 1% fp), so the
    * 100 TB held-out side is pruned map-side to ~fp-rate of its chunks
    * before the only shuffle join, whose left side is then tiny. The
    * reference chunk set is computed twice (Bloom build + verify join);
    * [[graft.GraftCache]] persists it between the two, and callers
    * release via `GraftCache.releaseAll()`. The Bloom membership probe
    * is a Scala UDF — acceptable off the codegen hot path because it
    * runs after the fingerprint projection and replaces a shuffle of
    * the full held-out chunk set.
    */
  def decontaminateByChunks(docs: DataFrame, refCol: Column, idCol: String, textCol: String,
      k: Int = 16, expectedRefChunks: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val refChunks = graft.GraftCache.registered(
      chunkFingerprints(docs.filter(refCol), idCol, textCol, k).select(col("fp")).distinct())
    val bloom = refChunks.stat.bloomFilter("fp", expectedRefChunks, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightBeRef = udf((fp: String) => bloomB.value.mightContainString(fp))
    val contaminated = chunkFingerprints(docs.filter(!refCol), idCol, textCol, k)
      .filter(mightBeRef(col("fp")))
      .join(refChunks, Seq("fp"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(!refCol)
      .select(col(idCol).cast("long").as("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Contiguous-fill sequence packing: within each stratum, documents
    * in `order` are laid end to end and `bin` is the index of the
    * `budget`-token window in which each document STARTS — the
    * deterministic batch-assembly shape for training (a bin's last
    * document may straddle into the next window; packing never reorders
    * or splits documents). Adds `cum` (running token total within the
    * stratum) and `bin`.
    *
    * Scale shape: one window aggregate partitioned by the strata — each
    * stratum packs in a single task, so strata must be bounded-size
    * shards (at 100 TB: pack per (source, day, shard-salt), not per
    * corpus; the strata ARE the parallelism). `order` must be unique
    * within a stratum for a deterministic layout.
    */
  def packBins(df: DataFrame, strata: Seq[Column], order: Column, weight: Column,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(weight).over(w))
      .withColumn("bin", floor((col("cum") - weight).cast("double") / budget).cast("long"))
  }

  /** Deterministic stratified sampling: keep a row iff the md5-derived
    * hash of its salted id falls under the stratum's per-cent rate
    * (`rateCol`, 0..100). Pure map-side filter — no shuffle, no state,
    * reproducible across runs and engines (the same arithmetic as the
    * q77 per-group sampler, rendered as a rate instead of a rank).
    */
  def stratifiedSample(df: DataFrame, idCol: String, rateCol: Column,
      salt: String = "strat_"): DataFrame =
    df.filter(
      pmod(Q.tokenHash(concat(lit(salt), col(idCol).cast("string"))), lit(100)) < rateCol)

  /** Vocabulary building: the `k` most frequent tokens per stratum
    * (lang/source) with counts — the seed step of tokenizer training
    * and OOV analysis. One map-side-combined (stratum, token) count
    * aggregate, then [[Relational.topKPerGroup]]'s ranking window: the
    * second shuffle carries one row per DISTINCT token per stratum
    * (vocabulary-sized, not corpus-sized), and the rank filter streams
    * per group — nothing vocabulary-sized is ever collected.
    */
  def vocabTopK(docs: DataFrame, strataCol: String, textCol: String, k: Int): DataFrame =
    Relational.topKPerGroup(
      graft.functions.Tokenize.exploded(docs, col(strataCol), col(textCol))
        .groupBy(col(strataCol), col("token")).agg(count(lit(1)).as("n")),
      k, Seq(col(strataCol)), Seq(col("n").desc, col("token").asc))

  /** Token-count histogram per stratum: documents and token mass per
    * `width`-token length bucket — the mixture/curriculum diagnostic
    * (what does my corpus length distribution look like per lang?).
    * Single map-side-combined aggregate on (stratum, bucket).
    */
  def lengthHistogram(docs: DataFrame, strataCol: String, textCol: String,
      width: Int = 16): DataFrame =
    docs.select(col(strataCol), size(Q.tokens(col(textCol))).as("n"))
      .groupBy(col(strataCol), (col("n").cast("long") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))

  /** Mixture resampling: deterministically downsample each source
    * toward an equal token share (DoReMi/Pile-style domain balancing).
    * Per-source keep rate = min(1, (total_tokens/n_sources) /
    * source_tokens); a document survives iff its salted md5 hash falls
    * under the rate — reproducible, no RNG state.
    *
    * Scale shape: the per-source token totals are ONE tiny aggregate
    * (rows = distinct sources) explicitly broadcast back onto the
    * corpus, and the rate filter is evaluated map-side — the corpus is
    * scanned twice (totals + filter) but never shuffled. The global
    * total rides the same broadcast (window over the empty frame), so
    * no driver round-trip either.
    */
  def mixtureResample(docs: DataFrame, srcCol: String, idCol: String,
      textCol: String): DataFrame = {
    val perSrc = docs
      .select(col(srcCol), col(idCol), size(Q.tokens(col(textCol))).as("n"))
      .groupBy(col(srcCol)).agg(sum(col("n")).as("src_tok"))
    val w = Window.partitionBy()
    val rates = broadcast(perSrc
      .withColumn("total_tok", sum(col("src_tok")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .select(col(srcCol),
        least(lit(1.0),
          col("total_tok").cast("double") / col("n_sources").cast("double")
            / col("src_tok").cast("double")).as("rate")))
    docs.join(rates, srcCol)
      .filter(pmod(Q.tokenHash(concat(lit("mix_"), col(idCol).cast("string"))), lit(1000000))
        < floor(col("rate") * 1000000))
  }

  /** Per-stratum percentile gate: keep rows whose `valueCol` is at or
    * above the stratum's `p`-quantile — "keep the top (1-p) of quality
    * per language" with a data-derived threshold instead of a magic
    * constant. The threshold table is one row per stratum, broadcast
    * back; the gate itself is a map-side comparison.
    *
    * Scale note: `percentile` is EXACT and buffers each stratum's
    * values in the aggregation — fine for bounded strata counts with
    * values that fit an executor (they're doubles, ~8 bytes each; 10^8
    * rows/stratum ≈ 1 GB). At 100 TB pass `approx = true`:
    * `approx_percentile` keeps sketch-sized state (relative rank error
    * <= 1/accuracy) in the same plan shape, and the gate join is
    * unchanged. The approx threshold's rank-error contract is graded in
    * q97 (within the exact [p-0.05, p+0.05] quantile band per stratum).
    */
  def percentileGate(df: DataFrame, strataCol: String, valueCol: String, p: Double,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val q = if (approx) approx_percentile(col(valueCol), lit(p), lit(accuracy))
            else percentile(col(valueCol), lit(p))
    val thr = broadcast(df.groupBy(col(strataCol)).agg(round(q, 6).as("_thr")))
    df.join(thr, Seq(strataCol)).filter(col(valueCol) >= col("_thr")).drop("_thr")
  }

  /** Corpus-wide adjacent-piece pair counts under the BPE-ish
    * pre-tokenizer — the count step of one BPE-training merge
    * iteration (which pair to merge next = the argmax of this table).
    * The pairing runs as a typed flatMap over the same regex as
    * [[graft.functions.TextFunctions.bpePieces]] (sliding windows beat
    * higher-order array zips, which drop out of whole-stage codegen);
    * one map-side-combined count aggregate, then global top-k via
    * TakeOrderedAndProject — pair-vocabulary-sized, never collected.
    */
  /** Iterative BPE merge TRAINING (Sennrich et al. 2016) — the loop
    * [[bpePairCounts]] is one step of, run the way production BPE
    * trainers run it: the corpus is scanned ONCE into a word-frequency
    * table (top `topV` words, freq-desc/word-asc tie-break), words are
    * symbolized to spaced characters, and every merge step then works
    * on that vocabulary-sized table — count adjacent symbol pairs
    * weighted by word frequency, pick the max (count desc, pair asc),
    * splice it, repeat. Per step: one vocabulary-sized aggregate + a
    * 1-row driver collect — corpus size never re-enters after the
    * first pass, which is why a 100 TB corpus trains as fast as its
    * vocabulary is big.
    *
    * The splice is ` x y ` → ` xy ` string replace applied
    * [[BpeSplicePasses]] times: a single pass misses every OTHER
    * occurrence of an overlapping chain (` a b a b ` shares the middle
    * space between matches), while iterating to the fixpoint lands on
    * exactly the greedy leftmost non-overlapping merge BPE defines —
    * e.g. pair (a,a) on ` a a a ` gives ` aa a `, never ` a aa `. Six
    * passes cover chains to 2^6 pairs (far past any word here); the
    * oracle nests the same six replaces, so the engines agree pass by
    * pass.
    *
    * Returns (step, pair, n): the learned merge table in order.
    */
  /** Splice passes per BPE merge step — see [[bpeTrain]]. */
  val BpeSplicePasses = 6

  def bpeTrain(docs: DataFrame, textCol: String, topV: Int, steps: Int): DataFrame = {
    val (m, vocab) = bpeTrainFull(docs, textCol, topV, steps)
    vocab.unpersist(blocking = false)
    m
  }

  /** [[bpeTrain]] plus the trained vocabulary: (merge table,
    * (word, freq, sym) with `sym` the word's final space-separated
    * segmentation). The vocabulary is what [[bpeSegment]] applies.
    */
  def bpeTrainFull(docs: DataFrame, textCol: String, topV: Int, steps: Int)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    var words = graft.functions.Tokenize.exploded(docs, lit(1).as("one"), col(textCol))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(topV)
      .select(col("token").as("word"), col("freq"))
      .withColumn("sym", array_join(chars, " "))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var s = 0
    while (s < steps) {
      s += 1
      val a = split(col("sym"), " ")
      val pairsOf = when(size(a) >= 2,
          transform(sequence(lit(0), size(a) - 2),
            i => concat(element_at(a, i + 1), lit(" "), element_at(a, i + 2))))
        .otherwise(array().cast("array<string>"))
      val best = words.select(col("freq"), explode(pairsOf).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) s = steps // vocabulary fully merged — stop
      else {
        val (bp, bn) = (best.head.getString(0), best.head.getLong(1))
        merges += ((merges.length + 1, bp, bn))
        val prev = words
        val spliced = (0 until BpeSplicePasses).foldLeft(
            concat(lit(" "), col("sym"), lit(" ")))((c, _) =>
          replace(c, lit(s" $bp "), lit(s" ${bp.replace(" ", "")} ")))
        words = words.withColumn("sym", trim(spliced)).localCheckpoint(true)
        prev.unpersist(blocking = false)
      }
    }
    // `words` stays checkpointed: it IS the trained vocabulary
    (merges.toSeq.toDF("step", "pair", "n"), words)
  }

  /** Apply a trained vocabulary to the corpus: per document, token
    * count and BPE piece count (in-vocabulary words take their trained
    * segmentation, out-of-vocabulary words fall back to characters —
    * the standard apply-time rule for a merge-trained tokenizer). The
    * vocabulary is broadcast (topV rows), so application is a pure
    * map-side pass over the exploded tokens + one per-doc aggregate —
    * the corpus-sized half stays one scan.
    */
  def bpeSegment(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    graft.functions.Tokenize.exploded(docs, col(idCol), col(textCol))
      .join(broadcast(vocab.select(col("word"), col("sym"))),
        col("token") === col("word"), "left")
      .select(col(idCol),
        when(col("sym").isNotNull, size(split(col("sym"), " ")))
          .otherwise(length(col("token"))).cast("long").as("pieces"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("pieces")).as("n_pieces"))

  def bpePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val re = graft.functions.TextFunctions.BpePiecePattern.r
    docs.select(col(textCol)).as[String]
      .flatMap { text =>
        val ps = re.findAllIn(text.toLowerCase).toArray
        if (ps.length < 2) Iterator.empty
        else ps.sliding(2).map(w => (w(0), w(1)))
      }
      .toDF("piece_a", "piece_b")
      .groupBy(col("piece_a"), col("piece_b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece_a"), col("piece_b"))
      .limit(k)
  }

  /** Unigram log-probability scoring — the distributed proxy for
    * CCNet-style LM-quality filtering: each document's mean
    * log-probability under the corpus's own unigram distribution
    * (spam/boilerplate scores high via repeated high-frequency tokens;
    * gibberish scores low via rare tokens). The unigram table is one
    * count aggregate (vocabulary-sized) broadcast back onto the token
    * stream; per-token log-probs are rounded to 6 decimals BEFORE the
    * per-doc mean so both engines average identical values. The global
    * total rides the broadcast via a window over the tiny frame — no
    * driver round-trip.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = Q.explodedTokens(docs, idCol, textCol)
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val table = broadcast(freq
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("total").cast("double")), 6).as("lp")))
    tok.join(table, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** Jelinek-Mercer interpolated BIGRAM log-prob per doc — the
    * KenLM-perplexity-filter shape (CCNet trains a 5-gram LM; the
    * estimation/backoff machinery is identical at order 2 and every
    * count is corpus-derived, so the whole model stays
    * oracle-replayable). Per-bigram score is
    * `ln(λ·P(w2|w1) + (1−λ)·P(w2))` with `P(w2|w1) = c(w1,w2)/c(w1·)`
    * over the bigram event space and `P(w2)` the corpus unigram MLE;
    * rounded to 6 decimals BEFORE the per-doc mean (same contract as
    * [[unigramLogProb]]). Docs with fewer than 2 tokens have no bigram
    * events and drop out.
    *
    * Scale: the model IS two count aggregations (bigram, unigram) —
    * map-side combined, keyed shuffles only; the scored join back to
    * occurrences is keyed by the bigram. The occurrence frame is read
    * twice (model + scoring) and rides [[graft.GraftCache]]. λ and
    * (1−λ) are both computed driver-side and rendered into the oracle
    * SQL from the SAME doubles — `1−0.7` is not the double `0.3`, and
    * the difference survives round-6.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokenize}
    val bi = graft.GraftCache.registered(
      docs.select(col(idCol), explode(shingles(tokenize(col(textCol)), 2)).as("bg"))
        .select(col(idCol),
          substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2")))
    val f2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val hist = f2.groupBy(col("w1")).agg(sum(col("c2")).as("ch"))
    val uni = Q.explodedTokens(docs, idCol, textCol)
      .groupBy(col("token")).agg(count(lit(1)).as("cu"))
      .withColumn("tot", sum(col("cu")).over(Window.partitionBy()))
    // Per-bigram scores are integer-ized to MICRO-units before the
    // per-doc mean: a float mean of round-6 doubles is summed in
    // engine-dependent order, and with ~30 addends the last-ulp drift
    // crosses a round-6 boundary on real data (3/500 docs at sf0.01
    // when this used round-then-avg). An integer sum is order-free;
    // the single division + round at the end is engine-exact.
    val lp = f2.join(hist, Seq("w1"))
      .join(uni.withColumnRenamed("token", "w2"), Seq("w2"))
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * (col("c2").cast("double") / col("ch").cast("double")) +
          lit(1.0 - lambda) * (col("cu").cast("double") / col("tot").cast("double"))) * 1e6)
          .cast("long").as("lpm"))
    bi.join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nb"), sum(col("lpm")).as("s"))
      .select(col(idCol), col("nb").cast("int").as("n_bigrams"),
        round(col("s").cast("double") / (col("nb").cast("double") * 1e6), 6)
          .as("avg_logprob"))
  }

  /** Gopher-style repetition statistics per document: total token
    * count, top-token frequency ratio (high → "the the the" spam) and
    * distinct-token ratio (low → repetitive). Two map-side-combined
    * hash aggregates — (doc, token) counts, then per-doc max/sum/count —
    * both keyed by doc_id, so the second reuses the first's
    * partitioning (no extra shuffle).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Q.explodedTokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("nt"), max(col("n")).as("mx"), count(lit(1)).as("nd"))
      .select(col(idCol),
        col("nt").cast("int").as("n_tokens"),
        round(col("mx").cast("double") / col("nt").cast("double"), 6).as("top_ratio"),
        round(col("nd").cast("double") / col("nt").cast("double"), 6).as("distinct_ratio"))

  /** Cross-source duplication matrix: for every ordered pair of corpus
    * sources (crawl snapshots, dumps being mixed), the number of
    * distinct `k`-token chunk fingerprints present in BOTH, and that
    * overlap as a fraction of the smaller source's distinct chunks —
    * the diagnostic that decides which source to drop (or dedup against
    * which) before mixing. Chunk granularity (vs whole-document
    * fingerprints) is what makes the signal usable: sources rarely
    * share verbatim documents, they share boilerplate. Shape: one
    * distinct over (fp, source) — the shuffle carries a 32-char
    * fingerprint + source tag, never text — then a self-join on fp
    * whose per-key cohabitation is bounded by the NUMBER OF SOURCES (a
    * fingerprint appears at most once per source after the distinct),
    * not the corpus: no bucket guard needed, this is quadratic only in
    * the source count. The per-source distinct totals reuse the same
    * frame; the sources-sized rate join broadcasts.
    */
  def crossSourceDupMatrix(docs: DataFrame, textCol: String,
      srcCol: String, k: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // same chunking as [[chunkFingerprints]], but keyed by source so no
    // corpus-wide join is needed to re-attach the source tag
    val fps = graft.GraftCache.registered(
      docs.select(col(srcCol), col(textCol)).as[(String, String)]
        .flatMap { case (src, text) =>
          val tk = graft.functions.Tokenize.closure(text)
          tk.grouped(k).withFilter(_.length == k).map(c => (src, c.mkString(" ")))
        }
        .toDF("source", "chunk")
        .select(col("source"), md5(col("chunk")).as("fp"))
        .distinct())
    val totals = fps.groupBy(col("source")).agg(count(lit(1)).as("n_fps"))
    val shared = fps.as("l").join(fps.as("r"),
        col("l.fp") === col("r.fp") && col("l.source") < col("r.source"))
      .groupBy(col("l.source").as("source_a"), col("r.source").as("source_b"))
      .agg(count(lit(1)).as("shared_fps"))
    shared
      .join(broadcast(totals.select(col("source").as("source_a"), col("n_fps").as("n_a"))), "source_a")
      .join(broadcast(totals.select(col("source").as("source_b"), col("n_fps").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_fps"),
        round(col("shared_fps").cast("double") / least(col("n_a"), col("n_b")).cast("double"), 6)
          .as("overlap_rate"))
  }

  /** Full-batch logistic-regression fit over a feature frame — the
    * training half of a model-based quality/language filter (the
    * fastText-classifier stage of DCLM/FineWeb-style pipelines, scored
    * here over interpretable features instead of word n-grams). Each
    * gradient-descent iteration is ONE distributed aggregation: the
    * mean gradient `avg((sigmoid(w·x) − y) · x_j)` per feature, which
    * map-side-combines to `numFeatures` doubles per partition — at
    * 100 TB each step shuffles kilobytes, and the driver holds only the
    * weight vector. Determinism contract: weights start at 0, the mean
    * gradient is rounded to 6 decimals IN the aggregation (both engines
    * round the same near-identical double), and `lr` is an integer so
    * the driver-side update `w − lr·g` stays on 6-decimal values
    * without a second engine-dependent rounding — the whole fit replays
    * exactly in SQL as `iters` unrolled scalar CTEs.
    *
    * `featCols` should include an explicit all-ones bias column.
    */
  /** PMI-style co-occurrence mining over (document, token) incidence:
    * for every unordered pair of distinct tokens co-occurring in a
    * document, the lift `P(a,b) / (P(a)·P(b))` — the collocation /
    * topic-pair signal a corpus profiler reads before building
    * phrase vocabularies. The score is the INTEGER micro-lift
    * `npair · N · 10⁶ div (na · nb)` (N = corpus document count):
    * exact in any summation order, so the oracle hash is stable where
    * a floating log-PMI could never be (same micro-unit discipline as
    * [[bigramLogProb]]).
    *
    * Scale: pair generation is the quadratic step, and it is bounded
    * per DOCUMENT, not per corpus: each doc contributes at most
    * `maxTokensPerDoc²/2` pairs (the cap keeps the lexicographically
    * first `maxTokensPerDoc` distinct tokens — deterministic, so both
    * engines cut identically), and only tokens with document frequency
    * ≥ `minDf` enter at all (rare-token pairs are noise AND volume).
    * The self-join is keyed by doc id — co-located, no global
    * quadratic anywhere. Pair counts and the two df-joins are keyed
    * hash aggregates; the final top-k is `TakeOrderedAndProject`.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 5, minPair: Int = 3, maxTokensPerDoc: Int = 64,
      k: Int = 50): DataFrame =
    liftPairs(Q.explodedTokens(docs, idCol, textCol)
        .select(col(idCol).as("id"), col("token")),
      col("id"), col("token"), docs.select(col(idCol)),
      minDf, minPair, maxTokensPerDoc, k)
      .withColumnRenamed("item_a", "tok_a")
      .withColumnRenamed("item_b", "tok_b")

  /** Generic co-occurrence lift over ANY (basket, item) incidence —
    * tokens in documents ([[pmiPairs]]), parts in orders
    * (market-basket analysis), tags on assets. `universe` supplies
    * the basket-count denominator independently of the incidence
    * frame, so baskets with zero (kept) items still count toward N.
    * Same bounded-quadratic discipline as [[pmiPairs]]: per-basket
    * item cap, support floor, basket-keyed self-join.
    */
  def liftPairs(incidence: DataFrame, basket: Column, item: Column,
      universe: DataFrame, minSupport: Int, minPair: Int,
      maxPerBasket: Int, k: Int): DataFrame = {
    // the universe frame IS the basket-id column — a multi-column frame
    // would silently countDistinct whatever happens to be first, skewing
    // every lift value with no error
    require(universe.columns.length == 1,
      s"liftPairs: universe must be exactly the basket-id column, got " +
        s"${universe.columns.length} columns (${universe.columns.mkString(", ")}) — " +
        "select the basket column before passing it")
    val nBaskets = broadcast(universe.agg(
      countDistinct(universe.columns.head).as("n_docs")))
    pairCounts(incidence, basket, item, minSupport, minPair, maxPerBasket)
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"),
        col("npair").cast("int").as("npair"),
        col("na").cast("int").as("na"), col("nb").cast("int").as("nb"),
        expr("(npair * n_docs * 1000000) div (na * nb)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("npair").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** The shared bounded-quadratic co-occurrence kernel under
    * [[liftPairs]]/[[pmiPairs]]/[[cosinePairs]]: distinct (basket,
    * item) incidence, support floor, per-basket item cap, basket-keyed
    * self-join — returns every surviving pair with its co-count and
    * both item frequencies, UNORDERED and UNLIMITED (the callers rank
    * by their own score).
    */
  private def pairCounts(incidence: DataFrame, basket: Column, item: Column,
      minSupport: Int, minPair: Int, maxPerBasket: Int): DataFrame = {
    val tok = graft.GraftCache.registered(
      incidence.select(basket.as("id"), item.as("item")).distinct())
    val dfreq = tok.groupBy(col("item")).agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") >= minSupport)
    // kept feeds BOTH legs of the pair self-join — persist or the
    // incidence scan + support join run twice
    val kept = graft.GraftCache.registered(
      tok.join(dfreq, "item")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("item"))))
        .filter(col("rn") <= maxPerBasket)
        .select(col("id"), col("item")))
    kept.as("a")
      .join(kept.as("b"), col("a.id") === col("b.id") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("npair"))
      .filter(col("npair") >= minPair)
      .join(dfreq.select(col("item").as("item_a"), col("dfreq").as("na")), "item_a")
      .join(dfreq.select(col("item").as("item_b"), col("dfreq").as("nb")), "item_b")
  }

  /** Item-item cosine similarity over binary (basket, item) incidence:
    * `cos(a,b) = co(a,b) / sqrt(n_a · n_b)` — the
    * collaborative-filtering neighbor score ("customers who bought a
    * also bought b"), normalized so ubiquitous items don't dominate
    * the way raw co-counts do. [[liftPairs]] answers "together more
    * than chance?"; cosine ranks "most similar", which is what a
    * recommender consumes.
    *
    * Same bounded-quadratic kernel as [[liftPairs]] (support floor,
    * per-basket cap, basket-keyed self-join — never all-pairs). The
    * one float: co/sqrt(na·nb) from exact integers — IEEE sqrt and
    * divide are correctly rounded, identical across engines — then
    * round-6.
    */
  def cosinePairs(incidence: DataFrame, basket: Column, item: Column,
      minSupport: Int, minPair: Int, maxPerBasket: Int, k: Int): DataFrame =
    pairCounts(incidence, basket, item, minSupport, minPair, maxPerBasket)
      .select(col("item_a"), col("item_b"),
        col("npair").cast("int").as("npair"),
        col("na").cast("int").as("na"), col("nb").cast("int").as("nb"),
        round(col("npair") / sqrt(col("na").cast("double") * col("nb")), 6)
          .as("cos_r6"))
      .orderBy(col("cos_r6").desc, col("npair").desc, col("item_a"), col("item_b"))
      .limit(k)

  /** Deterministic weighted priority sample (A-ES family, integerized):
    * each row's priority is a fixed 60-bit hash of its id divided
    * (integer `div`) by its positive integer weight; the sample is the
    * k SMALLEST priorities. Doubling a row's weight halves its
    * priority — inclusion probability scales with weight — and the
    * whole draw is a pure function of (id, weight, salt): reproducible
    * across runs, engines, and cluster sizes, with no RNG state to
    * coordinate. The float A-ES key `u^(1/w)` would not survive a
    * cross-engine hash compare; the integer quotient is exact.
    *
    * Scale: one codegen'd projection + `TakeOrderedAndProject` (O(k)
    * state per partition); nothing shuffles but the k winners.
    */
  def weightedPrioritySample(df: DataFrame, idCol: String, weight: Column,
      k: Int, salt: String = "wps"): DataFrame = {
    val hash60 = conv(substring(md5(concat(lit(salt + "_"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.withColumn("w", weight.cast("long"))
      .withColumn("h", hash60)
      .withColumn("priority", expr("h div w"))
      .drop("h")
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Deterministic shard assignment for training-data output: shard =
    * 32-bit md5 prefix of (salt, id) mod `nShards`. A global seeded
    * shuffle without any RNG: every engine, run, and cluster size
    * produces the same shard for the same id, so shard files are
    * reproducible artifacts (and incremental re-runs only rewrite the
    * shards whose inputs changed). The hash is the same
    * [[graft.plans.Md5Prefix32]] codegen expression the dedup
    * signatures use.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shard"): DataFrame =
    df.withColumn("shard",
      pmod(Q.tokenHash(concat(lit(salt + "_"), col(idCol).cast("string"))),
        lit(nShards)).cast("int"))

  /** Write the corpus as `nShards` deterministic training shards:
    * [[shardAssign]] then one hash repartition ON the shard column so
    * each output directory is written by exactly one task family, via
    * the parquet `partitionBy` layout (`shard=K/` directories). At
    * production scale the shard count is the downstream loader's
    * parallelism unit; the repartition is the only shuffle and carries
    * each row once.
    */
  def writeTrainShards(df: DataFrame, idCol: String, nShards: Int,
      dir: String, salt: String = "shard"): Unit =
    shardAssign(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Gopher-style n-gram repetition rules (Rae et al. 2021, §A1.1,
    * adapted to token fractions): per document, the fraction of all
    * 2-grams taken by the single most frequent 2-gram (`top2_micro`,
    * boilerplate/chorus detector) and the fraction of 3-gram
    * occurrences whose 3-gram appears more than once (`dup3_micro`,
    * loop detector), both as exact integer micro-fractions
    * (`x·10⁶ div n`). `flagged` applies the paper's thresholds (0.20
    * top-2-gram, 0.18 dup-3-gram). Documents with fewer than 3 tokens
    * have no 3-gram events and drop out (same contract as
    * [[bigramLogProb]]).
    *
    * Scale: two (doc, gram) count aggregates — both keyed by doc id
    * with map-side combine, shuffling 32-char fingerprints of grams
    * rather than gram text.
    */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
      top2Threshold: Long = 200000L, dup3Threshold: Long = 180000L): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    // Gram statistics are DOCUMENT-LOCAL — every count, max, and
    // dup-sum is computable from one document's ~10² grams alone — so
    // the right kernel is a single typed map with a per-doc hash map:
    // one corpus pass, ZERO shuffles, embarrassingly parallel. The
    // first cut keyed two corpus-sized (doc, gram) aggregates instead
    // (the "SQL reflex" shape): 105 s at the 100x soak tier and
    // superlinear (exp 1.32) into the 1000x tier as the 500M-row
    // shuffles started spilling, where this kernel is the scan floor.
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val tk = graft.functions.Tokenize.closure(text)
        if (tk.length < 3) Iterator.empty
        else {
          // allocation-free inner loop: hash each token once (FNV-1a),
          // gram hash = FNV chain over token hashes, then sort + count
          // runs — a per-gram string build (sliding().mkString) was
          // itself 2x the whole pass. 64-bit collisions only matter
          // WITHIN one doc's ~10² grams: vanishing, and the oracle's
          // raw-string counts agree or the gate catches it.
          val th = new Array[Long](tk.length)
          var i = 0
          while (i < tk.length) {
            val s = tk(i); var h = 0xcbf29ce484222325L; var c = 0
            while (c < s.length) { h ^= s.charAt(c); h *= 0x100000001b3L; c += 1 }
            th(i) = h; i += 1
          }
          def stats(n: Int): (Long, Long, Long) = {
            val m = tk.length - n + 1
            val gh = new Array[Long](m)
            var j = 0
            while (j < m) {
              var h = 0xcbf29ce484222325L; var k = 0
              while (k < n) { h = (h ^ th(j + k)) * 0x100000001b3L; k += 1 }
              gh(j) = h; j += 1
            }
            java.util.Arrays.sort(gh)
            var mx = 0L; var dup = 0L; var run = 1L; var idx = 1
            while (idx <= m) {
              if (idx < m && gh(idx) == gh(idx - 1)) run += 1
              else { if (run > mx) mx = run; if (run > 1) dup += run; run = 1 }
              idx += 1
            }
            (m.toLong, mx, dup)
          }
          val (n2, mx2, _) = stats(2)
          val (n3, _, dup3) = stats(3)
          // Long '/' truncates toward zero == `div` on the positives here
          Iterator((id, n2, n3, mx2 * 1000000L / n2, dup3 * 1000000L / n3))
        }
      }
      .toDF(idCol, "n2l", "n3l", "top2_micro", "dup3_micro")
      .select(col(idCol),
        col("n2l").cast("int").as("n2"), col("n3l").cast("int").as("n3"),
        col("top2_micro"), col("dup3_micro"))
      .withColumn("flagged",
        col("top2_micro") > top2Threshold || col("dup3_micro") > dup3Threshold)
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * interpolated bigram LM ([[bigramLogProb]] — the oracle-replayable
    * stand-in for CCNet's KenLM 5-gram), rank the corpus by mean
    * log-prob, and split into `head` / `middle` / `tail` tertiles —
    * the classic "keep head+middle, drop tail" curation gate. The
    * graded form is exact `ntile(3)` SEMANTICS over the total order
    * (avg_logprob DESC, id) so both engines bucket identically — but
    * computed via [[graft.operators.Ranking.globalNtile]]: tertile
    * boundaries as exact order statistics over the skinny
    * (avg_logprob, id) projection, broadcast back, buckets assigned by
    * comparison. No partition-less WindowExec anywhere in the plan
    * (the previous `ntile(3).over(Window.orderBy(…))` moved every doc
    * to ONE task — the single straggler a 100 TB corpus cannot pay);
    * value-identical because (avg_logprob, id) is a strict total
    * order, so no tie can straddle a boundary.
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    val lp = graft.GraftCache.registered(bigramLogProb(docs, idCol, textCol, lambda))
    Ranking.globalNtile(lp,
        Seq(Ranking.Key(col("avg_logprob"), asc = false), Ranking.Key(col(idCol))), 3, "t")
      .withColumn("bucket",
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("n_bigrams")).cast("long").as("n_bigrams"),
        min(col("avg_logprob")).as("min_lp"),
        max(col("avg_logprob")).as("max_lp"))
  }

  /** The VALUE-SEMANTICS alternative to [[ccnetBuckets]]: tertile
    * THRESHOLDS from one exact-percentile aggregate (broadcast back),
    * then a value comparison per doc. Since round 13 the graded form
    * is scale-safe too (order-statistic boundaries via
    * [[graft.operators.Ranking.globalNtile]] — exact RANK semantics,
    * no single-partition window), so the remaining trade is pure
    * semantics + cost: with distinct scores the two forms agree up to
    * at most one doc per boundary (interpolated-threshold placement —
    * pinned in ScaleOpsSpec); TIED scores all land in one bucket here
    * where ntile splits them by rank. Rank semantics replay exactly
    * in SQL (why the gate grades ntile); this form is one aggregate
    * cheaper, and at corpus scale `percentile_approx` makes the whole
    * pass two scans and kilobytes of state where the rank form still
    * pays a range shuffle of the skinny key projection.
    */
  def ccnetBucketsByThreshold(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    val lp = bigramLogProb(docs, idCol, textCol, lambda)
    val th = broadcast(lp.agg(
      expr("percentile(avg_logprob, array(CAST(2.0/3.0 AS DOUBLE), CAST(1.0/3.0 AS DOUBLE)))").as("t")))
    lp.crossJoin(th)
      .withColumn("bucket",
        when(col("avg_logprob") >= element_at(col("t"), 1), "head")
          .when(col("avg_logprob") >= element_at(col("t"), 2), "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("n_bigrams")).cast("long").as("n_bigrams"),
        min(col("avg_logprob")).as("min_lp"),
        max(col("avg_logprob")).as("max_lp"))
  }

  def logisticFit(features: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int, lr: Int = 1): Seq[Double] = {
    var w = Seq.fill(featCols.size)(0.0)
    for (_ <- 0 until iters) {
      val margin = featCols.zip(w).map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val gExprs = featCols.map(c => round(avg((p - col(labelCol)) * col(c)), 6))
      val g = features.agg(gExprs.head, gExprs.tail: _*).head().toSeq
        .map { case d: Double => d }
      w = w.zip(g).map { case (wj, gj) => wj - lr * gj }
    }
    w
  }

  /** The fitted score column: `sigmoid(w·x)` over the same feature
    * columns — a pure projection, applied corpus-wide with no shuffle.
    */
  def logisticScore(featCols: Seq[String], weights: Seq[Double]): Column = {
    val margin = featCols.zip(weights).map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }
}
