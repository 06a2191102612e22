package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract plumbing.
  *
  * IMAGE decode is REAL: the stock JDK ships `javax.imageio` codecs for
  * PNG/BMP/JPEG/GIF, so [[decodeImage]]/[[imageStats]] parse actual
  * image bytes (and [[encodeBmp]] writes them — pure header+pixel
  * arithmetic, no library). AUDIO decode is REAL for WAV/PCM16:
  * [[decodeWav]] walks the RIFF chunk list and scans raw samples (and
  * [[encodeWav]] writes them) — again pure header arithmetic. Video
  * byte-level decode has no in-container codec and stays a
  * clearly-marked deterministic STUB —
  * but the Spark-side plumbing is real: schema, batched per-partition
  * processing, and partitioning behavior are exactly what a production
  * decode (ffmpeg behind the same signature) would use. Heavy decode
  * work belongs in `mapPartitions` so per-partition setup (codec init)
  * amortizes across rows, and media tables should be stored with the
  * binary column LAST and metadata columns first, so metadata-only
  * queries never read the bytes (parquet column pruning).
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

  /** STUB decode (audio/video only — no in-container codec): derives
    * pseudo-dimensions from the content so tests are stable and the
    * dataflow (bytes in → typed meta out) is exercised end to end. */
  private[ext] def decodeStub(id: Long, format: String, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    MediaMeta(id, format, n,
      width = (math.floorMod(h, 7) * 32 + 64).toInt,
      height = (math.floorMod(h >> 8, 5) * 32 + 64).toInt,
      nFrames = if (format == "video") (math.floorMod(h >> 16, 120) + 1).toInt else 1)
  }

  /** Batched decode over partitions: one codec context per partition, rows
    * streamed through it (the Scala analogue of `mapInPandas` batches).
    * Image rows whose bytes PARSE as a real image (PNG/BMP/JPEG/GIF via
    * the JDK's `javax.imageio`) report their true decoded dimensions;
    * anything else — audio/video, or image rows whose payload is not
    * actually image bytes — falls back to the deterministic stub. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.mapPartitions { rows =>
      // ImageIO scans for codec plugins per-JVM; mapPartitions keeps any
      // per-partition decoder setup amortized, as a real codec needs
      rows.map { r =>
        val real = if (r.format == "image") decodeImage(r.media) else None
        real match {
          case Some(st) => MediaMeta(r.id, r.format,
            if (r.media == null) 0L else r.media.length.toLong,
            st.width, st.height, nFrames = 1)
          case None => decodeStub(r.id, r.format, r.media)
        }
      }
    }
  }

  /** Exact decoded-pixel statistics: dimensions, pixel count, and the
    * per-channel integer SUMS (not float means — sums are bit-exact and
    * oracle-portable; a mean is one division away for the caller). */
  final case class ImageStats(
      width: Int, height: Int, nPx: Long, sumR: Long, sumG: Long, sumB: Long)

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/JPEG/GIF
    * readers ship with the stock JRE — verified in MultimodalSpec).
    * Returns None when the bytes do not parse as a supported image, so
    * callers can fall back to the stub path; never throws on garbage. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[ImageStats] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, h, w.toLong * h, sr, sg, sb))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real per-image pixel statistics over a media table: one decoded
    * (id, width, height, n_px, sum_r, sum_g, sum_b) row per image whose
    * bytes parse; non-images and undecodable rows are dropped (decode
    * yield is itself a data-quality signal — count the difference).
    * Integer sums, so downstream aggregation is oracle-exact. */
  final case class ImageStatsRow(
      id: Long, width: Int, height: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  def imageStats(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[ImageStatsRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => decodeImage(r.media).map(st =>
        ImageStatsRow(r.id, st.width, st.height, st.nPx,
          st.sumR, st.sumG, st.sumB)))
    }.toDF()
  }

  /** Pure-JVM 24-bit BMP encoder (BITMAPINFOHEADER, bottom-up rows,
    * BGR byte order, 4-byte row padding — plain header+pixel arithmetic,
    * no library). `px(x, y)` returns (r, g, b), each masked to 0–255.
    * Gives the engine a real image WRITE path so decode tests and
    * fixture generation need no external assets. */
  def encodeBmp(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val size = 54 + dataSize
    val out = new Array[Byte](size)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up storage: last image row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        bb.put((b & 0xff).toByte).put((g & 0xff).toByte).put((r & 0xff).toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    out
  }

  /** Deterministic synthetic image: doc_id fully determines dimensions
    * and every pixel (plain modular arithmetic), so an oracle can
    * recompute the expected pixel sums WITHOUT decoding — which makes
    * the whole encode→ImageIO-decode round trip independently
    * verifiable (the x66 query). */
  def syntheticBmp(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    encodeBmp(w, h, (x, y) => (
      ((docId + 7L * x + 13L * y) % 256).toInt,
      ((3L * docId + 11L * x + y) % 256).toInt,
      ((x.toLong * y + docId) % 256).toInt))
  }

  // ---------------------------------------------------------------- audio

  /** Exact decoded-audio statistics: stream geometry plus the integer
    * SUM of absolute sample amplitudes and the peak — integer outputs,
    * so downstream aggregation is oracle-exact (the pixel-sum argument
    * of [[ImageStats]] applied to PCM). `durationUs` is truncating
    * integer division (`nFrames * 1e6 / sampleRate`). */
  final case class AudioStats(
      sampleRate: Int, channels: Int, nFrames: Long,
      peakAbs: Int, sumAbs: Long) {
    def durationUs: Long = nFrames * 1000000L / sampleRate
  }

  /** REAL WAV (RIFF / PCM16) decode — pure header+chunk arithmetic, no
    * library: walks the RIFF chunk list (tolerating extra chunks like
    * `LIST` and odd-size padding per the spec), validates PCM16 `fmt `,
    * then scans the `data` payload as little-endian 16-bit samples.
    * Returns None when the bytes do not parse as PCM16 WAV, so callers
    * can fall back to the stub path; never throws on garbage. */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[AudioStats] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      if (bb.getInt(0) != 0x46464952 || bb.getInt(8) != 0x45564157)
        return None // "RIFF" ... "WAVE" (little-endian fourccs)
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0; var pcm = false
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = bb.getInt(pos)
        val sz = bb.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return None
        if (id == 0x20746d66) { // "fmt "
          if (sz < 16) return None
          pcm = (bb.getShort(pos + 8) & 0xffff) == 1
          channels = bb.getShort(pos + 10) & 0xffff
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
        } else if (id == 0x61746164) { // "data"
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // RIFF chunks pad to even offsets
      }
      if (!pcm || bits != 16 || channels <= 0 || sampleRate <= 0 || dataOff < 0) None
      else {
        val nSamp = dataLen / 2
        var i = 0; var sum = 0L; var peak = 0
        while (i < nSamp) {
          val a = math.abs(bb.getShort(dataOff + 2 * i).toInt)
          sum += a
          if (a > peak) peak = a
          i += 1
        }
        Some(AudioStats(sampleRate, channels, nSamp.toLong / channels, peak, sum))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pure-JVM PCM16 WAV encoder (canonical 44-byte RIFF header, LE
    * interleaved samples — plain header arithmetic, no library). The
    * audio WRITE path twin of [[encodeBmp]]: decode tests and fixture
    * generation need no external assets. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataSize).putInt(0x45564157) // RIFF/WAVE
    bb.putInt(0x20746d66).putInt(16)                               // "fmt ", 16
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)                           // byte rate
      .putShort((channels * 2).toShort).putShort(16)               // align, bits
    bb.putInt(0x61746164).putInt(dataSize)                         // "data"
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    out
  }

  /** Deterministic synthetic audio: doc_id fully determines channel
    * count, frame count, and every interleaved sample (plain modular
    * arithmetic), so an oracle can recompute the expected amplitude
    * sums WITHOUT decoding — the [[syntheticBmp]] trick for the
    * encode→decode WAV round trip (the x72 query). 8 kHz keeps
    * `durationUs` exact (1e6/8000 = 125). */
  def syntheticWav(docId: Long): Array[Byte] = {
    val channels = (1 + docId % 2).toInt
    val nFrames = (64 + docId % 33).toInt
    val samples = Array.tabulate(nFrames * channels)(i =>
      ((docId * 31L + 17L * i) % 4096L - 2048L).toShort)
    encodeWav(8000, channels, samples)
  }

  /** Real per-clip audio statistics over a media table: one decoded
    * (id, sample_rate, channels, n_frames, duration_us, peak_abs,
    * sum_abs) row per clip whose bytes parse as PCM16 WAV; garbage and
    * non-audio rows are dropped (decode yield is the quality signal).
    * Map-only inside mapPartitions — the same 100 TB shape as
    * [[imageStats]]: codec amortized per partition, no shuffle. */
  final case class AudioStatsRow(
      id: Long, sample_rate: Long, channels: Long, n_frames: Long,
      duration_us: Long, peak_abs: Long, sum_abs: Long)

  def audioStats(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[AudioStatsRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => decodeWav(r.media).map(st =>
        AudioStatsRow(r.id, st.sampleRate.toLong, st.channels.toLong,
          st.nFrames, st.durationUs, st.peakAbs.toLong, st.sumAbs)))
    }.toDF()
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
