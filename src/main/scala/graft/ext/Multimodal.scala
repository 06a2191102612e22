package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract plumbing.
  *
  * The media libraries are not in this container, so the byte-level decode
  * is a clearly-marked deterministic STUB — but the Spark-side plumbing is
  * real: schema, batched per-partition processing, and partitioning
  * behavior are exactly what a production decode (libjpeg/ffmpeg behind
  * the same signature) would use. Heavy decode work belongs in
  * `mapPartitions` so per-partition setup (codec init) amortizes across
  * rows, and media tables should be stored with the binary column LAST and
  * metadata columns first, so metadata-only queries never read the bytes
  * (parquet column pruning).
  */
object Multimodal {

  /** Typed metadata extracted from a media blob. */
  final case class MediaMeta(
      id: Long, format: String, nBytes: Long,
      width: Int, height: Int, nFrames: Int)

  final case class MediaRecord(id: Long, format: String, media: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("media", BinaryType)))

  /** STUB decode: a real implementation hands `bytes` to an image/audio
    * codec. The deterministic fake derives pseudo-dimensions from the
    * content so tests are stable and the dataflow (bytes in → typed meta
    * out) is exercised end to end. */
  private[ext] def decodeStub(id: Long, format: String, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    MediaMeta(id, format, n,
      width = (math.floorMod(h, 7) * 32 + 64).toInt,
      height = (math.floorMod(h >> 8, 5) * 32 + 64).toInt,
      nFrames = if (format == "video") (math.floorMod(h >> 16, 120) + 1).toInt else 1)
  }

  /** Batched decode over partitions: one codec context per partition, rows
    * streamed through it (the Scala analogue of `mapInPandas` batches). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions { rows =>
      // real impl: initialize codec/decoder once per partition here
      rows.map(r => decodeStub(r.id, r.format, r.media))
    }
  }

  /** Frame sampling plumbing for video-like media: emit `every`-th frame
    * index as (id, frame_no) — a real impl would also slice the bytes. */
  def sampleFrames(meta: Dataset[MediaMeta], every: Int): DataFrame =
    meta.toDF().select(col("id"), col("nFrames"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(every))).as("frame_no"))
      .select(col("id"), col("frame_no"))

  /** Wrap a text table as a media table (test harness: bytes = utf8 text,
    * format from a deterministic rotation). Real pipelines read the bytes
    * from object storage. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("format"),
      col(payloadCol).cast("binary").as("media"))

  final case class ResizedMedia(
      id: Long, width: Int, height: Int, media: Array[Byte])

  /** STUB resize: a real implementation re-encodes `bytes` at the target
    * dimensions behind this exact signature. The fake truncates/pads to a
    * size-proportional byte budget so output size actually tracks the
    * target dims and the batch shape (bytes in → bytes out, one codec
    * context per partition) is exercised. */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[ResizedMedia] = {
    require(width > 0 && height > 0)
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { rows =>
      // real impl: initialize the image codec once per partition here.
      // Long arithmetic: 65536×65536 overflows Int silently and would
      // clamp every payload to one byte
      val budget = math.min(Int.MaxValue.toLong,
        math.max(1L, width.toLong * height.toLong / 64)).toInt
      rows.map { r =>
        val b = if (r.media == null) Array.empty[Byte] else r.media
        ResizedMedia(r.id, width, height,
          if (b.length >= budget) b.take(budget)
          else b ++ Array.fill(budget - b.length)(0.toByte))
      }
    }
  }

  /** STUB feature extraction: bytes → dense `Array[Float]` embedding (a
    * real implementation runs a vision/audio encoder behind this
    * signature; batching per partition is where the model session
    * amortizes). The deterministic fake rolls a hash through the byte
    * stream so near-identical payloads get near-identical vectors —
    * enough for the downstream contract: the output column is exactly
    * the `Array[Float]` embedding shape the [[Similarity]] ANN
    * operators consume, so media → features → ANN composes end to end
    * (proven in ExtOpsSpec). */
  final case class MediaFeatures(id: Long, embedding: Array[Float])

  def features(media: Dataset[MediaRecord], dim: Int = 16): DataFrame = {
    require(dim > 0)
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // real impl: load the encoder weights once per partition here
      rows.map { r =>
        val b = if (r.media == null) Array.empty[Byte] else r.media
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < b.length) {
          h = h * 31 + (b(i) & 0xff)
          v(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
          i += 1
        }
        MediaFeatures(r.id, v)
      }
    }.toDF()
  }
}
