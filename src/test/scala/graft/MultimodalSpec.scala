package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.queries.Q

/** Binary-column plumbing specs: schema, batch shape and determinism
  * of the (stub-codec) decode path.
  */
class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload with typed id") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents"))
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(media.count() > 0)
  }

  test("decodeFeatures is deterministic and preserves row count") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents"))
    val a = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(a.length === media.count())
    assert(a.map(_.n_bytes).toSeq === b.map(_.n_bytes).toSeq)
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    assert(a.forall(f => f.features.length == 8 && f.width >= 16 && f.height >= 16))
  }

  test("frameSample explodes payloads into bounded frames with stable keys") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents")).limit(10)
    val frames = Multimodal.frameSample(spark, media, 4)
    val perDoc = frames.groupBy(col("doc_id")).count().collect().map(_.getLong(1))
    assert(perDoc.forall(_ <= 4))
    assert(frames.schema("frame_bytes").dataType.typeName === "binary")
  }

  test("decoded features support downstream relational ops") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents"))
    val feats = Multimodal.decodeFeatures(spark, media).toDF()
    val agg = feats.groupBy(col("media_type")).agg(avg(col("n_bytes")).as("avg_bytes"))
    assert(agg.collect().nonEmpty)
  }

  test("resize produces constant-size output regardless of input size") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents")).limit(20)
    val resized = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.forall(_.pixels.length === 64))
    // deterministic
    val again = Multimodal.resize(spark, media, 8, 8).collect()
    assert(resized.sortBy(_.doc_id).map(_.pixels.toSeq).toSeq ===
      again.sortBy(_.doc_id).map(_.pixels.toSeq).toSeq)
  }

  test("frameFeatures aggregates per-frame vectors into one doc vector") {
    val media = Multimodal.asMediaTable(Q.t(spark, sf001, "documents")).limit(10)
    val feats = Multimodal.frameFeatures(spark, media, 4)
    val rows = feats.collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Seq[Double]]("doc_features").length === 8))
  }

  test("PNG round trip is lossless: decode reproduces dims and stride sums") {
    // local codec check, no Spark: grayscale PNG must reproduce the
    // raster exactly, and the decoded stride sums must equal the sums
    // computed directly from the source bytes (the q104 oracle's claim)
    val bytes = "The quick brown fox jumps over the lazy dog 0123456789"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val png = Multimodal.pngEncodeGray(bytes, 16)
    // a real PNG: magic bytes present
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val (mt, w, h, feats) = Multimodal.pngDecode(png)
    assert(mt === "image/png")
    assert(w === 16)
    assert(h === (bytes.length + 15) / 16)
    val expect = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc += (bytes(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000.0f
    }
    assert(feats.toSeq === expect.toSeq)
    // non-image payloads refuse loudly instead of returning junk
    intercept[IllegalArgumentException] {
      Multimodal.pngDecode("not a png".getBytes)
    }
  }

  test("q104 PNG decode pipeline matches the stub twin's row count at sf0.001") {
    val real = graft.queries.AnalyticsQueries.queries("q104_multimodal_png")(spark, sf001)
    val stub = graft.queries.AnalyticsQueries.queries("q65_multimodal_decode")(spark, sf001)
    assert(real.count() === stub.count())
    // every decoded raster is 16 wide with the text's stride sums
    val r = real.collect()
    assert(r.forall(_.getAs[Int]("width") === 16))
    assert(r.forall(_.getAs[String]("media_type") === "image/png"))
  }

  test("WAV round trip is lossless incl. negative samples; decode walks extra chunks") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val wav = Multimodal.wavEncodePcm16(samples, 8000)
    val (rate, back) = Multimodal.wavDecodePcm16(wav)
    assert(rate === 8000)
    assert(back.toSeq === samples.toSeq)
    // splice a LIST chunk between fmt and data — real-world WAVs do
    // this, and a fixed-44-byte parser would misread the sample area
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = wav.take(36) ++ extra ++ wav.drop(36)
    val (rate2, back2) = Multimodal.wavDecodePcm16(spliced)
    assert(rate2 === 8000)
    assert(back2.toSeq === samples.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.wavDecodePcm16("definitely not RIFF".getBytes)
    }
  }

  test("resizePngNearest: identity at source dims; NN picks floor-mapped pixels") {
    // 16x4 raster of bytes 0..63: pixel(x,y) = y*16+x
    val bytes = Array.tabulate(64)(_.toByte)
    val png = Multimodal.pngEncodeGray(bytes, 16)
    val (w, h, same) = Multimodal.resizePngNearest(png, 16, 4)
    assert((w, h) === ((16, 4)))
    assert(same.toSeq === bytes.map(_.toInt).toSeq)
    // downsample to 8x2: srcX = 2x, srcY = 2y
    val (_, _, dn) = Multimodal.resizePngNearest(png, 8, 2)
    val want = for (y <- 0 until 2; x <- 0 until 8) yield (2 * y) * 16 + 2 * x
    assert(dn.toSeq === want)
    // upsample to 32x4: srcX = x/2 (floor)
    val (_, _, up) = Multimodal.resizePngNearest(png, 32, 4)
    assert(up.take(4).toSeq === Seq(0, 0, 1, 1))
  }

  test("GIF multi-frame round trip is lossless and frame-random-access") {
    val f0 = Array.tabulate(64)(_.toByte)
    val f1 = Array.tabulate(64)(i => (255 - i).toByte)
    val f2 = Array.tabulate(64)(i => (i * 3 % 256).toByte)
    val gif = Multimodal.gifEncodeFrames(Seq(f0, f1, f2), 16)
    assert(new String(gif.take(6), "US-ASCII") === "GIF89a")
    assert(Multimodal.gifFrameCount(gif) === 3)
    // random access: decode frames 0 and 2 only, skipping 1
    val got = Multimodal.gifDecodeFrames(gif, Seq(0, 2))
    assert(got.map(_._1) === Seq(0, 2))
    assert(got.forall { case (_, w, h, _) => w == 16 && h == 4 })
    assert(got(0)._4.toSeq === f0.map(_ & 0xff).toSeq)
    assert(got(1)._4.toSeq === f2.map(_ & 0xff).toSeq)
  }

  test("q120 GIF frame-sample: even frames only, fixed 16x4 geometry") {
    val got = graft.queries.AnalyticsQueries.queries("q120_multimodal_gif")(spark, sf001)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Int]("frame_no") % 2 === 0))
    assert(got.forall(r => r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 4))
    // every doc contributes ceil(n_frames / 2) sampled rows
    val byDoc = got.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.forall { case (_, rows) =>
      rows.length == (rows.head.getAs[Int]("n_frames") + 1) / 2 })
  }

  test("q118 WAV decode pipeline: one row per doc, rate 8000, len(text) samples") {
    val got = graft.queries.AnalyticsQueries.queries("q118_multimodal_wav")(spark, sf001)
      .collect()
    val docs = Q.t(spark, sf001, "documents")
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.length === docs.size)
    assert(got.forall(_.getAs[Int]("sample_rate") === 8000))
    assert(got.forall(r => r.getAs[Int]("n_samples") === docs(r.getAs[Long]("doc_id"))))
  }
}
