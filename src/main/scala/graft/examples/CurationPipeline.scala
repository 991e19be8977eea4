package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Curation

/** End-to-end batch-preparation pipeline — the stage AFTER
  * [[CorpusPipeline.clean]]'s dedup: turn a cleaned corpus into
  * training-ready, decontaminated, mixture-balanced, packed batches:
  *
  *   percentile quality gate (data-derived per-lang threshold)
  *     → exact chunk-level decontamination vs a reference partition
  *       (Bloom prefilter + exact verify)
  *     → mixture resample toward equal per-source token share
  *     → contiguous-fill packing into fixed token budgets per lang.
  *
  * Every stage is one aggregate + a broadcast-side join or a map-side
  * filter; the corpus is never shuffled except by the final packing
  * window, whose strata are the parallelism (pack per (lang) here,
  * per (source, day, shard) at 100 TB).
  */
object CurationPipeline {

  def prepare(docs: DataFrame, refCol: Column, budget: Long = 256L,
      qualityPercentile: Double = 0.2): DataFrame = {
    val held = docs.filter(!refCol)
    // codegen'd aggregate scoring path (bit-equal to qualityScore,
    // ~10x faster at corpus scale — see NOTES_r4 §q88)
    val scored = held
      .join(TextFunctions.tokenAggregates(held, "doc_id", "text"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        TextFunctions.qualityFromScores(col("text")).as("quality"))
    val gated = Curation.percentileGate(scored, "lang", "quality", qualityPercentile)
    val decontaminated = gated.join(
      Curation.decontaminateByChunks(docs, refCol, "doc_id", "text"),
      Seq("doc_id"), "left_semi")
    val balanced = Curation.mixtureResample(decontaminated, "source", "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        size(graft.queries.Q.tokens(col("text"))).as("n_tokens"))
    Curation.packBins(balanced, Seq(col("lang")), col("doc_id"), col("n_tokens"), budget)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        col("n_tokens"), col("bin"))
  }
}
