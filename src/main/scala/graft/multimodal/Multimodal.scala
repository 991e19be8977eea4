package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct —
  * the Spark-side schema, partitioning and batch shape are real; only
  * the codec itself is stubbed (this container has no image/audio
  * libraries), clearly marked below.
  *
  * Scale design: decode runs in `mapPartitions` so per-partition codec
  * state (a decoder instance, a model handle) is initialized once per
  * task, not per row — the same shape a Pandas-UDF/`mapInPandas` batch
  * decoder has in PySpark. Binary payloads never shuffle: decode is
  * map-side, and downstream aggregations run on the extracted features.
  */
object Multimodal {

  /** One decoded media record: metadata + fixed-size feature vector. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB CODEC — deterministic fake. A real deployment replaces this
    * with an actual image/audio decode (e.g. javax.imageio /
    * ffmpeg-bound JNI). The fake derives metadata and features from
    * the payload bytes so tests are reproducible.
    */
  def stubDecode(payload: Array[Byte]): (String, Int, Int, Array[Float]) = {
    val mediaType = if (payload.length % 2 == 0) "image" else "audio"
    val width = 16 + (math.abs(payload.headOption.getOrElse(0: Byte).toInt) % 64)
    val height = 16 + (payload.length % 64)
    val features = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < payload.length) { acc += (payload(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000.0f
    }
    (mediaType, width, height, features)
  }

  /** Attach a binary payload column (here derived from text — the
    * testdata has no real media) with the schema a media table carries:
    * (id, payload binary, meta struct).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batch decode: one codec init per partition, streaming over rows —
    * the `mapInPandas` shape in Scala. Returns a typed Dataset of
    * features ready for downstream relational ops.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init happens HERE (once per task)
        rows.map { case (id, payload) =>
          val (mt, w, h, feats) = stubDecode(payload)
          MediaFeatures(id, payload.length, mt, w, h, feats)
        }
      }
  }

  /** STUB RESIZE — deterministic fake of an image resize: maps a
    * payload to a fixed-size byte grid by strided sampling (a real
    * deployment swaps in an actual scaler). Keeps the true contract:
    * output size is constant regardless of input size.
    */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    val n = math.max(1, payload.length)
    var i = 0
    while (i < out.length) { out(i) = payload((i.toLong * n / out.length).toInt % n); i += 1 }
    out
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Batch resize over the media table — map-side, constant output
    * schema `(doc_id, width, height, pixels binary)`.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => ResizedMedia(id, w, h, stubResize(p, w, h)) })
  }

  /** Per-frame feature pipeline: frame-sample → per-frame decode →
    * per-doc feature aggregation (mean over frames). The video shape:
    * features never shuffle raw bytes — only the 8-float vectors.
    */
  def frameFeatures(spark: SparkSession, media: DataFrame, frames: Int): DataFrame = {
    import spark.implicits._
    val perFrame = frameSample(spark, media, frames)
      .select(col("doc_id"), col("frame_no"), col("frame_bytes")).as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, f, bytes) =>
        val (_, _, _, feats) = stubDecode(bytes)
        (id, f, feats)
      }).toDF("doc_id", "frame_no", "features")
    perFrame
      .select(col("doc_id"), posexplode(col("features")).as(Seq("pos", "v")))
      .groupBy(col("doc_id"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("doc_id"), transform(col("pm"), x => x.getField("m")).as("doc_features"))
  }

  /** Frame-sample shape for video-like payloads: explode a payload into
    * n fixed-stride chunks (stand-in for frame extraction), keeping the
    * (id, frame_no) key so downstream per-frame features group
    * correctly.
    */
  def frameSample(spark: SparkSession, media: DataFrame, frames: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val stride = math.max(1, payload.length / frames)
        (0 until math.min(frames, payload.length)).map { f =>
          val start = f * stride
          val end = math.min(payload.length, start + stride)
          (id, f, payload.slice(start, end))
        }
      }.toDF("doc_id", "frame_no", "frame_bytes")
  }
}
