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
      // memory-cached stream — ImageIO.read(InputStream) would write a
      // disk cache file per image (see decodeGifFrames)
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)): javax.imageio.stream.ImageInputStream)
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

  /** Perceptual average-hash (aHash) over the REAL decoded image: the
    * top-left 8×8 crop's per-pixel gray sums (r+g+b — a SUM, not a
    * float luma, so the oracle can recompute it with integer
    * arithmetic), each pixel voting brighter-than-average via the
    * division-free comparison `64·gray > Σgray`. The 64 bits pack into
    * TWO 32-bit halves carried as non-negative longs — packing all 64
    * into one long would put bit 0 on the sign bit, which DuckDB's
    * `<<` overflow check rejects; two halves keep every value
    * engine-portable. Bit (y·8+x) sits at position 31−i (i<32, hi) /
    * 63−i (lo): MSB-first raster order.
    *
    * This is the multimodal×dedup crossover: near-identical images
    * (re-encodes, brightness shifts — a global +c moves pixels and
    * mean together, flipping almost no votes) land within a few bits,
    * so the simhash banding machinery applies unchanged. Crop-based by
    * contract (images here are ≥8×8 by construction); a production
    * variant average-pools to 8×8 first — same downstream shape.
    * Undecodable rows and images smaller than the crop are dropped. */
  final case class AHashRow(id: Long, hash_hi: Long, hash_lo: Long)

  def imageAHash(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[AHashRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => aHashHalves(r.media).map { case (hi, lo) =>
        AHashRow(r.id, hi, lo) })
    }.toDF()
  }

  /** Executor-side bytes → (hash_hi, hash_lo); None when the bytes do
    * not decode or the image is smaller than the 8×8 crop. Shared by
    * [[imageAHash]] and callers that need the hash as a plain UDF
    * (e.g. a streaming frame feeding
    * [[TextDedup.nearDupStreamingSig]]). */
  private[graft] def aHashHalves(bytes: Array[Byte]): Option[(Long, Long)] = {
    val img =
      try {
        Option(javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(
              if (bytes == null) Array.emptyByteArray else bytes))
            : javax.imageio.stream.ImageInputStream))
      } catch { case scala.util.control.NonFatal(_) => None }
    img.filter(i => i.getWidth >= 8 && i.getHeight >= 8).map { i =>
      val gray = new Array[Int](64)
      var total = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val rgb = i.getRGB(x, y)
          val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          gray(y * 8 + x) = g
          total += g
          x += 1
        }
        y += 1
      }
      var hi = 0L
      var lo = 0L
      var j = 0
      while (j < 64) {
        val bit = if (64L * gray(j) > total) 1L else 0L
        if (j < 32) hi = (hi << 1) | bit else lo = (lo << 1) | bit
        j += 1
      }
      (hi, lo)
    }
  }

  /** The two aHash halves packed into ONE 64-bit signature
    * (`hi << 32 | lo`) — the form [[TextDedup.nearDupStreamingSig]]'s
    * hamming band machinery consumes. */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    aHashHalves(bytes).map { case (hi, lo) => (hi << 32) | lo }

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

  /** [[syntheticWav]] re-encoded at `gain`× volume — a genuinely
    * PERTURBED twin, not a byte copy: every sample differs, but energy
    * trends are exactly gain-invariant (e'(w) = g·e(w) preserves each
    * adjacent comparison), so [[audioFingerprint]] must collide the
    * pair — the x142 robustness property as an oracle-checkable fact.
    * No clipping by construction: |sample| ≤ 2047·gain must stay under
    * 32767 (gain ≤ 16). */
  def syntheticWavGain(docId: Long, gain: Int): Array[Byte] = {
    require(gain >= 1 && gain <= 16, "gain would clip PCM16")
    val channels = (1 + docId % 2).toInt
    val nFrames = (64 + docId % 33).toInt
    val samples = Array.tabulate(nFrames * channels)(i =>
      (((docId * 31L + 17L * i) % 4096L - 2048L) * gain).toShort)
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

  /** Content fingerprint of a REAL decoded clip: the interleaved
    * samples split into 32 integer-boundary windows
    * (`window(i) = (32·i) div nSamples` — division-free per-window
    * boundaries an oracle replicates exactly), per-window absolute
    * energy sums, and one TREND bit per adjacent window pair
    * (`e_w > e_{w−1}`, w = 1..31) packed MSB-first into a non-negative
    * 31-bit long. Energy TRENDS survive re-encoding and uniform gain
    * where raw samples do not — the Chromaprint idea reduced to its
    * integer-exact core. Clips shorter than 32 samples (and anything
    * that fails the PCM16 walk) drop. One scan, no shuffle. */
  final case class AudioFpRow(id: Long, fp: Long)

  /** 31 adjacent-trend bits over 32 window sums, MSB-first — the shared
    * fold of [[audioFingerprint]] and [[videoFingerprint]]. */
  private def trendBits(e: Array[Long]): Long = {
    var fp = 0L
    var w = 1
    while (w < 32) {
      if (e(w) > e(w - 1)) fp |= 1L << (31 - w)
      w += 1
    }
    fp
  }

  /** Per-clip form of [[audioFingerprint]] — usable as a streaming UDF
    * signature for [[TextDedup.nearDupStreamingSig]] (None → null → the
    * operator drops the row, the batch undecodable-drop contract). */
  def audioFp64(bytes: Array[Byte]): Option[Long] =
    decodeWavWindows(bytes, 32).map(trendBits)

  def audioFingerprint(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[AudioFpRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => audioFp64(r.media).map(AudioFpRow(r.id, _)))
    }.toDF()
  }

  /** The [[decodeWav]] chunk walk, aggregating per-window absolute
    * energy instead of global stats. None on parse failure or when the
    * clip has fewer samples than windows. */
  private[graft] def decodeWavWindows(bytes: Array[Byte],
      windows: Int): Option[Array[Long]] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      if (bb.getInt(0) != 0x46464952 || bb.getInt(8) != 0x45564157)
        return None
      var pos = 12
      var bits = 0; var pcm = false; var channels = 0
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= bytes.length) {
        val id = bb.getInt(pos)
        val sz = bb.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return None
        if (id == 0x20746d66) { // "fmt "
          if (sz < 16) return None
          pcm = (bb.getShort(pos + 8) & 0xffff) == 1
          channels = bb.getShort(pos + 10) & 0xffff
          bits = bb.getShort(pos + 22) & 0xffff
        } else if (id == 0x61746164) { // "data"
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1)
      }
      val nSamp = dataLen / 2
      if (!pcm || bits != 16 || channels <= 0 || dataOff < 0 ||
        nSamp < windows) None
      else {
        val e = new Array[Long](windows)
        var i = 0
        while (i < nSamp) {
          e(((windows.toLong * i) / nSamp).toInt) +=
            math.abs(bb.getShort(dataOff + 2 * i).toInt)
          i += 1
        }
        Some(e)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL multi-frame decode via the JDK's GIF codec (`javax.imageio`
    * reads animated GIF frame-by-frame with random access): the
    * video-shaped media path executed against an actual temporal
    * format, not a stub. Only every `stride`-th frame is decoded —
    * `ImageReader.read(i)` is random-access, so frame sampling skips
    * the decode cost of unsampled frames, which is the point of frame
    * sampling at 100 TB. Returns (frameNo, width, height, luma sum)
    * per sampled frame; None when the bytes are not a GIF. */
  private[graft] def decodeGifFrames(bytes: Array[Byte],
      stride: Int): Option[Seq[(Int, Int, Int, Long)]] = {
    if (bytes == null || bytes.length < 6) return None
    // full "GIF87a"/"GIF89a" magic — cheap reject before codec setup
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') ||
      bytes(5) != 'a') return None
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!it.hasNext) return None
    val reader = it.next()
    try {
      // memory-cached stream, NOT ImageIO.createImageInputStream: the
      // factory default writes a disk cache file per clip (the classic
      // ImageIO throughput trap — measured dominating the x112 scan)
      reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      if (n <= 0) return None // magic matched but no decodable frame
      Some((0 until n by stride).map { i =>
        val img = reader.read(i)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += (img.getRGB(x, y) >> 16) & 0xff // r == g == b here
            x += 1
          }
          y += 1
        }
        (i, img.getWidth, img.getHeight, sum)
      })
    } catch { case scala.util.control.NonFatal(_) => None }
    finally reader.dispose()
  }

  /** Spatiotemporal content fingerprint of a REAL decoded clip — the
    * [[audioFingerprint]] trend trick on the (frame, row) axis: the
    * sampled frames' per-ROW luma sums form one ordered sequence,
    * 32 integer-boundary windows aggregate it, and 31 adjacent-trend
    * bits pack MSB-first into a non-negative long. Row sums (not whole-
    * frame sums) keep spatial structure in the signal; trends (not raw
    * values) survive re-encoding and uniform brightness shifts. Clips
    * that fail the GIF decode drop. One scan, no shuffle. */
  final case class VideoFpRow(id: Long, fp: Long)

  /** Per-clip form of [[videoFingerprint]] — usable as a streaming UDF
    * signature for [[TextDedup.nearDupStreamingSig]]. */
  def videoFp64(bytes: Array[Byte], stride: Int = 1): Option[Long] =
    decodeGifRowSums(bytes, stride).map { v =>
      val k = v.length
      val e = new Array[Long](32)
      var i = 0
      while (i < k) { e(((32L * i) / k).toInt) += v(i); i += 1 }
      trendBits(e)
    }

  def videoFingerprint(media: Dataset[MediaRecord],
      stride: Int = 1): DataFrame = {
    implicit val enc = Encoders.product[VideoFpRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => videoFp64(r.media, stride).map(VideoFpRow(r.id, _)))
    }.toDF()
  }

  /** The [[decodeGifFrames]] walk, emitting the per-row luma sums of
    * every sampled frame as one (frame-major, row-minor) sequence. */
  private[graft] def decodeGifRowSums(bytes: Array[Byte],
      stride: Int): Option[Array[Long]] = {
    if (bytes == null || bytes.length < 6) return None
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != '8' || (bytes(4) != '7' && bytes(4) != '9') ||
      bytes(5) != 'a') return None
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!it.hasNext) return None
    val reader = it.next()
    try {
      reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      (0 until n by stride).foreach { i =>
        val img = reader.read(i)
        var y = 0
        while (y < img.getHeight) {
          var sum = 0L
          var x = 0
          while (x < img.getWidth) {
            sum += (img.getRGB(x, y) >> 16) & 0xff // r == g == b here
            x += 1
          }
          out += sum
          y += 1
        }
      }
      Some(out.toArray)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally reader.dispose()
  }

  /** Multi-frame GIF encoder via the JDK's sequence writer. Frames are
    * written as INDEXED images over an explicit identity 256-gray
    * palette (`palette[v] = gray v`), so the encode is LOSSLESS BY
    * CONSTRUCTION — handing the writer RGB frames instead lets it
    * derive a palette by sampling, which quantizes degenerate tiny
    * frames (observed: a 3×2 frame's second row collapsed). Bit-exact
    * round trip, formula-oracle-checkable like
    * [[encodeBmp]]/[[encodeWav]]. */
  def encodeGif(width: Int, height: Int, frames: Int,
      px: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0)
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    // memory-cached, not the disk-cache-file factory default (see
    // decodeGifFrames)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      // interlace OFF via image metadata: the JDK writer interlaces by
      // default and mis-encodes frames shorter than the interlace pass
      // spacing (observed: height ≤ 4 rows come back permuted/zeroed) —
      // progressive row order round-trips every size. Metadata depends
      // only on the image TYPE, so the DOM edit runs once per clip, not
      // per frame (it dominated encode cost on the bench).
      val p = w.getDefaultWriteParam
      val proto = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val md = w.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(proto), p)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt)
      var c = tree.getFirstChild
      while (c != null) {
        if (c.getNodeName == "ImageDescriptor")
          c.asInstanceOf[org.w3c.dom.Element]
            .setAttribute("interlaceFlag", "FALSE")
        c = c.getNextSibling
      }
      md.setFromTree(fmt, tree)
      for (f <- 0 until frames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        for (y <- 0 until height; x <- 0 until width)
          raster.setSample(x, y, 0, px(x, y, f) & 0xff)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, md), p)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic synthetic animation: doc_id fully determines dims,
    * frame count and every pixel (`(id + 7x + 13y + 53f) % 256`), so
    * the oracle recomputes sampled-frame luma sums from the formula
    * WITHOUT decoding — a bug in either the sequence writer or the
    * frame-sampling reader breaks the hash (the x66/x72 argument on a
    * temporal axis). */
  def syntheticGif(docId: Long): Array[Byte] = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val frames = (2 + docId % 4).toInt
    encodeGif(w, h, frames,
      (x, y, f) => ((docId + 7L * x + 13L * y + 53L * f) % 256L).toInt)
  }

  /** Window-aligned synthetic clip with a uniform brightness `shift` —
    * the perturbed-twin generator for the x143 robustness property.
    * Geometry is FIXED at 4 frames × 8 rows = 32 row sums (exactly one
    * per trend window) and pixels stay in 0..199 (+shift ≤ 255, no
    * clamping), so a uniform shift adds the same constant to every
    * window sum and [[videoFingerprint]]'s trend bits are EXACTLY
    * shift-invariant — `syntheticGifShift(id, 0)` and
    * `syntheticGifShift(id, 40)` must collide, with every pixel
    * different. (At the free geometry of [[syntheticGif]], windows
    * aggregate unequal row counts and a shift could flip a
    * near-tied trend — alignment is what makes the invariance an
    * integer identity rather than a usually-true heuristic.) */
  def syntheticGifShift(docId: Long, shift: Int): Array[Byte] = {
    require(shift >= 0 && shift <= 55, "shift would clamp 8-bit pixels")
    val w = (8 + docId % 9).toInt
    encodeGif(w, 8, 4,
      (x, y, f) =>
        ((docId + 7L * x + 13L * y + 53L * f) % 200L).toInt + shift)
  }

  /** Sampled-frame statistics over a media table: one (id, frame_no,
    * width, height, luma_sum) row per DECODED frame, decoding only
    * every `stride`-th frame of each clip. Map-only inside
    * mapPartitions (codec amortized per partition, no shuffle) — the
    * 100 TB video-feature shape: stride-sampling bounds decode cost,
    * rows with undecodable bytes drop out as the yield signal. */
  final case class FrameStatsRow(
      id: Long, frame_no: Long, width: Long, height: Long, luma_sum: Long)

  def videoFrameStats(media: Dataset[MediaRecord],
      stride: Int = 2): DataFrame = {
    implicit val enc = Encoders.product[FrameStatsRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => decodeGifFrames(r.media, stride)
        .getOrElse(Seq.empty)
        .map { case (f, w, h, s) =>
          FrameStatsRow(r.id, f.toLong, w.toLong, h.toLong, s) })
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

  /** REAL resize: decode via the JDK codec (BMP/GIF/PNG/JPEG — whatever
    * `ImageIO` reads), NEAREST-NEIGHBOR sample with the pure-integer
    * source mapping `src = dst·srcDim div dstDim` (division-free of
    * rounding modes and float filter taps, so an oracle replicates every
    * output pixel exactly), re-encode through the repo's own BMP writer
    * ([[encodeBmp]] — the encodeWav/encodeGif precedent). Map-only
    * inside mapPartitions, the same 100 TB shape as [[imageStats]].
    *
    * Bytes with NO JDK decoder (or garbage) fall back to the former
    * byte-budget shape — truncate/pad to a dimension-proportional
    * budget — keeping the operator TOTAL (a resize stage must never
    * drop or kill on one alien format; the fallback is detectable:
    * its payload is not a valid BMP). The x144 query hash-pins the
    * real path end to end: synthetic formula → BMP encode → JDK decode
    * → integer NN sample → BMP re-encode → JDK re-decode → pixel sums
    * recomputed by the oracle from the formula alone. */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[ResizedMedia] = {
    require(width > 0 && height > 0)
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded =
          try Option(javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(
                if (r.media == null) Array.emptyByteArray else r.media))
              : javax.imageio.stream.ImageInputStream))
          catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(img) =>
            val (sw, sh) = (img.getWidth, img.getHeight)
            ResizedMedia(r.id, width, height,
              encodeBmp(width, height, (x, y) => {
                val rgb = img.getRGB(
                  (x.toLong * sw / width).toInt, (y.toLong * sh / height).toInt)
                ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
              }))
          case None =>
            // no decoder for these bytes: budget fallback (total op).
            // Long arithmetic: 65536×65536 overflows Int silently and
            // would clamp every payload to one byte
            val budget = math.min(Int.MaxValue.toLong,
              math.max(1L, width.toLong * height.toLong / 64)).toInt
            val b = if (r.media == null) Array.empty[Byte] else r.media
            ResizedMedia(r.id, width, height,
              if (b.length >= budget) b.take(budget)
              else b ++ Array.fill(budget - b.length)(0.toByte))
        }
      }
    }
  }

  /** Feature extraction: bytes → dense `Array[Float]` embedding via a
    * REAL seeded random-projection patch embedding (a public, fully
    * deterministic technique — random-feature projections):
    *
    *  1. DECODE the bytes with the JDK codec (same path as [[resize]]/
    *     [[imageAHash]]);
    *  2. average-pool the decoded pixels onto a fixed 8×8 grid — pixel
    *     (x, y) belongs to cell `((8x) div w, (8y) div h)`, cell value =
    *     `sum(luma) div n_px` with luma = r+g+b (the [[aHashHalves]]
    *     luma), all integer arithmetic;
    *  3. project the 64 pooled values through a SEEDED integer weight
    *     matrix `W[i][g] = ((seed + 31·i + 7·g + i·g) mod 3) − 1`
    *     ∈ {−1, 0, +1} — each output coordinate a ±-signed sum of
    *     pooled patches.
    *
    * Every output value is an exact small integer (|eᵢ| ≤ 64·765 <
    * 2²⁴), representable in Float without rounding — so the whole
    * pipeline is formula-oracle-able over synthetic images exactly like
    * x141/x144 (hash-pinned end to end by x150). Near-identical images
    * (re-encodes, small edits) pool to near-identical grids and land
    * near each other in the embedding space, which is the contract the
    * downstream [[Similarity]] ANN operators need; decode-path
    * embeddings are L2-comparable per construction.
    *
    * Bytes with NO image decoder (audio, video, alien formats) keep
    * the operator TOTAL: the byte stream itself is pooled into 64
    * equal blocks (`block = (64·i) div len`, value = `sum(byte) div
    * n`) and projected through the same matrix — deterministic,
    * byte-identical payloads get identical vectors, and the fallback
    * is detectable (it never saw a decoder).
    *
    * PRODUCTION SWAP SEAM: a learned encoder (CLIP-style vision tower)
    * replaces steps 2–3 behind this exact signature — mapPartitions is
    * where the model session loads once per partition and batches; the
    * schema, partitioning, and `Array[Float]` output column are what
    * the rest of the engine consumes either way. */
  final case class MediaFeatures(id: Long, embedding: Array[Float])

  def features(media: Dataset[MediaRecord], dim: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(dim > 0)
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // a learned-encoder impl loads its weights ONCE here, per partition
      rows.map { r =>
        val b = if (r.media == null) Array.empty[Byte] else r.media
        MediaFeatures(r.id, projectPatches(pooledGrid(b), dim, seed))
      }
    }.toDF()
  }

  /** Steps 1–2 of [[features]]: decode + 8×8 integer average-pool; byte
    * blocks when no decoder applies (or the image is under 8×8). */
  private[graft] def pooledGrid(b: Array[Byte]): Array[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b))
          : javax.imageio.stream.ImageInputStream))
      catch { case scala.util.control.NonFatal(_) => None }
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    img.filter(i => i.getWidth >= 8 && i.getHeight >= 8) match {
      case Some(i) =>
        val (w, h) = (i.getWidth, i.getHeight)
        var y = 0
        while (y < h) {
          val gy = (8 * y) / h
          var x = 0
          while (x < w) {
            val rgb = i.getRGB(x, y)
            val g = gy * 8 + (8 * x) / w
            sums(g) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            counts(g) += 1
            x += 1
          }
          y += 1
        }
      case None =>
        var i = 0
        while (i < b.length) {
          val g = ((64L * i) / b.length).toInt
          sums(g) += (b(i) & 0xff)
          counts(g) += 1
          i += 1
        }
    }
    val pooled = new Array[Long](64)
    var g = 0
    while (g < 64) {
      pooled(g) = if (counts(g) > 0) sums(g) / counts(g) else 0L
      g += 1
    }
    pooled
  }

  /** Step 3 of [[features]]: the seeded {−1,0,+1} projection. */
  private[graft] def projectPatches(pooled: Array[Long], dim: Int,
      seed: Long): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var e = 0L
      var g = 0
      while (g < 64) {
        e += (java.lang.Math.floorMod(seed + 31L * i + 7L * g + i.toLong * g,
          3L) - 1L) * pooled(g) // floorMod: well-defined for negative seeds
        g += 1
      }
      v(i) = e.toFloat // exact: |e| ≤ 64·765 < 2^24
      i += 1
    }
    v
  }
}
