package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Similarity}

/** Dev-only timing probe for hot queries (not part of the contract). */
object Probe {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    val docs = docs0.repartition(4)
    time("warmup count")(docs0.count())
    println("[probe] partitions raw=" + docs0.rdd.getNumPartitions)
    time("tok explode raw")(docs0.select(explode(tokenize(col("text")))).count())
    time("tok explode repart")(docs.select(explode(tokenize(col("text")))).count())
    val sh = docs.select(col("doc_id"), explode(shingles(tokenize(col("text")), 3)).as("shingle"))
    time("shingle explode")(sh.count())
    time("shingle md5")(sh.select(md5(col("shingle"))).count())
    time("shingle h31")(sh.select(Dedup.h31(col("shingle"))).count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("minhash sigs")(sigs.count())
    time("candidates+verify")(Dedup.jaccardVerify(docs, Dedup.minhashCandidates(sigs), "doc_id", "text", 0.6).count())
    time("ngram_jaccard")(Dedup.ngramJaccardPairs(docs, 0.5).count())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").repartition(4)
    val e = emb.select(col("vec_id"), col("label"), Similarity.toDoubleVec(col("embedding")).as("e"))
    time("neardup pairs")(
      e.as("l").join(e.as("r"), col("l.label") === col("r.label") && col("l.vec_id") < col("r.vec_id"))
        .select(round(Similarity.cosine(col("l.e"), col("r.e")), 6).as("c")).filter(col("c") >= 0.4).count())
    spark.stop()
  }
}
