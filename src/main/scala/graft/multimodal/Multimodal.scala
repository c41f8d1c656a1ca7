package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition
  * passes.
  *
  * The Spark-side plumbing is real — schema, typed Dataset, batched
  * `mapPartitions` (the JVM analogue of a Pandas-UDF `mapInPandas`
  * pass: fixed-size batches per partition, one codec instance per
  * partition, columnar-friendly output). Four codecs sit behind
  * [[MediaCodec]], one per modality, ALL REAL: [[ImageIoCodec]]
  * decodes PNG/JPEG on the JDK's built-in `javax.imageio` (q108
  * round-trips actual PNG bytes through it under an oracle);
  * [[WavCodec]] decodes WAV/PCM through the [[Wav]] RIFF demux
  * (q121, same trick for audio); [[AviMjpegCodec]] decodes
  * MJPEG-in-AVI video — a RIFF container walk ([[AviMjpeg]]) plus a
  * per-frame `javax.imageio` JPEG decode (q221, same trick through
  * real compressed video bytes); and [[ByteBlockCodec]] is the
  * modality-agnostic fixed-block chunker for OPAQUE blobs a pipeline
  * hasn't onboarded a decoder for yet (q44 runs it over raw text
  * bytes — block geometry and mean-byte stats need no format).
  */
final case class MediaBlob(doc_id: Long, media_type: String, data: Array[Byte])

final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long, n_frames: Int,
    header: Array[Byte], feature: Array[Float])

trait MediaCodec extends Serializable {
  def mediaType: String
  def decode(blob: MediaBlob): MediaFeatures
}

/** Modality-agnostic OPAQUE-blob codec: fixed 256-byte blocks stand
  * in for frames, the "feature" is the mean byte value of
  * `featureDim` SAMPLED blocks (every `frameStride`-th — the
  * frame-sampling knob any media pipeline needs: stride 1 reads the
  * clip head, stride k spreads the same feature budget across k× the
  * duration); the header is the first 4 bytes. This is the metadata
  * pass a 100 TB ingest runs over formats it has not onboarded a
  * real decoder for — geometry, sampling and byte statistics need no
  * format knowledge. Real decoders ([[ImageIoCodec]], [[WavCodec]],
  * [[AviMjpegCodec]]) drop into the identical partition pass.
  */
final class ByteBlockCodec(val mediaType: String = "application/octet-stream",
                           val frameStride: Int = 1,
                           val featureDim: Int = 8) extends MediaCodec {
  require(frameStride >= 1, "frameStride must be >= 1")
  val FrameSize = 256

  override def decode(blob: MediaBlob): MediaFeatures = {
    val bytes = blob.data
    val nFrames = (bytes.length + FrameSize - 1) / FrameSize
    val feature = (0 until featureDim).map { f =>
      val from = f * frameStride * FrameSize
      if (from >= bytes.length) 0.0f
      else {
        val until = math.min(from + FrameSize, bytes.length)
        var s = 0L; var i = from
        while (i < until) { s += bytes(i) & 0xff; i += 1 }
        (s.toDouble / (until - from)).toFloat
      }
    }.toArray
    MediaFeatures(blob.doc_id, blob.media_type, bytes.length.toLong,
      nFrames, bytes.take(4), feature)
  }
}

/** REAL image codec over the JDK's built-in `javax.imageio` (PNG/JPEG
  * — no external libraries). Decodes the blob to a `BufferedImage` and
  * emits geometry + exact per-channel pixel sums as the feature
  * vector: `[width, height, sumR, sumG, sumB, 0…]`. Sums stay exact in
  * Float up to 2²⁴ (a 16×8 tile sums to ≤ 32640), so the declared
  * query can cast them back to BIGINT losslessly. `n_frames` = 1 —
  * stills have one frame; an animated reader would plug in the same
  * way via `ImageIO.getImageReaders`.
  */
final class ImageIoCodec(val featureDim: Int = 8) extends MediaCodec {
  require(featureDim >= 5, "featureDim must fit [w, h, sumR, sumG, sumB]")
  override val mediaType: String = "image/png"

  override def decode(blob: MediaBlob): MediaFeatures = {
    ImageIoTuning.ensure
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob.data))
    require(img != null, s"undecodable image blob for doc ${blob.doc_id}")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
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
    val feature = new Array[Float](featureDim)
    feature(0) = w.toFloat
    feature(1) = h.toFloat
    feature(2) = sr.toFloat
    feature(3) = sg.toFloat
    feature(4) = sb.toFloat
    MediaFeatures(blob.doc_id, mediaType, blob.data.length.toLong, 1,
      blob.data.take(4), feature)
  }
}

/** REAL audio codec: parses the RIFF/WAVE container ([[Wav]] — the
  * hand-rolled demux that replaced `javax.sound.sampled` in the hot
  * path, see [[Wav]]'s scaladoc for why; interop with AudioSystem is
  * spec-pinned), streams the PCM
  * payload, and emits `[sampleRate, nSamples, sum, sumAbs, maxAbs]`
  * as the feature vector, every value computed from decoded 16-bit
  * samples. Sums stay exact in Float well past this data's
  * |sample| ≤ 1024 × nSamples ≤ 192 range (< 2²⁴), so the declared
  * query casts them back to BIGINT losslessly. Video gets the same
  * treatment via [[AviMjpegCodec]].
  */
final class WavCodec(val featureDim: Int = 8) extends MediaCodec {
  require(featureDim >= 5,
    "featureDim must fit [rate, n, sum, sumAbs, maxAbs]")
  override val mediaType: String = "audio/wav"

  override def decode(blob: MediaBlob): MediaFeatures = {
    val (rate, pcm) = Wav.readPcm16Mono(blob.data, blob.doc_id)
    val n = pcm.length / 2
    var sum = 0L; var sumAbs = 0L; var maxAbs = 0L
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
      sum += s
      val a = math.abs(s)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val feature = new Array[Float](featureDim)
    feature(0) = rate.toFloat
    feature(1) = n.toFloat
    feature(2) = sum.toFloat
    feature(3) = sumAbs.toFloat
    feature(4) = maxAbs.toFloat
    MediaFeatures(blob.doc_id, mediaType, blob.data.length.toLong, n,
      blob.data.take(4), feature)
  }
}

/** Minimal RIFF/WAVE mux/demux for PCM16 mono little-endian — the
  * HOT-PATH replacement for `javax.sound.sampled.AudioSystem`, which
  * under Spark's task context classloader re-scans audio service
  * providers on EVERY call (measured at sf1: 50k encodes run 0.7 s on
  * plain JDK threads but ~6 s inside Spark tasks, serializing the
  * whole audio family). The container layout is byte-identical to
  * AudioSystem's canonical output (44-byte header: RIFF/WAVE, 16-byte
  * PCM `fmt `, `data`); the reader is a defensive chunk walker like
  * [[AviMjpeg.readFrames]], so it also accepts WAVs with extra
  * chunks. Interop both directions (we read what AudioSystem writes,
  * AudioSystem reads what we write) is pinned in `MultimodalSuite`.
  */
object Wav {
  def writePcm16Mono(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(pcm.length % 2 == 0, "PCM16 payload must be even-length")
    val out = new Array[Byte](44 + pcm.length)
    def cc(o: Int, s: String): Unit = { val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, o, 4) }
    def u32(o: Int, v: Long): Unit = { out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte }
    def u16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte }
    cc(0, "RIFF"); u32(4, 36L + pcm.length); cc(8, "WAVE")
    cc(12, "fmt "); u32(16, 16L)
    u16(20, 1); u16(22, 1)                      // PCM, mono
    u32(24, sampleRate.toLong); u32(28, sampleRate.toLong * 2)
    u16(32, 2); u16(34, 16)                     // block align, bits
    cc(36, "data"); u32(40, pcm.length.toLong)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** (sampleRate, pcm payload) of a PCM16 mono LE WAV; throws on any
    * other format — same contract the AudioSystem path enforced. */
  def readPcm16Mono(wav: Array[Byte], docId: Long): (Int, Array[Byte]) = {
    require(wav.length >= 12 && new String(wav, 0, 4, "US-ASCII") == "RIFF"
        && new String(wav, 8, 4, "US-ASCII") == "WAVE",
      s"doc $docId: not a RIFF/WAVE container (${wav.length} bytes)")
    val end = math.min(wav.length.toLong, 8L + le32(wav, 4))
    var rate = -1; var ok = false
    var pcm: Array[Byte] = null
    var p = 12L
    while (p + 8 <= end) {
      val id = new String(wav, p.toInt, 4, "US-ASCII")
      val size = le32(wav, p.toInt + 4)
      require(p + 8 + size <= end, s"doc $docId: truncated WAV chunk '$id'")
      if (id == "fmt ") {
        require(size >= 16, s"doc $docId: short fmt chunk")
        val o = p.toInt + 8
        val codec = le16(wav, o); val ch = le16(wav, o + 2)
        val bits = le16(wav, o + 14)
        require(codec == 1 && ch == 1 && bits == 16,
          s"doc $docId: expected mono 16-bit PCM, got codec=$codec ch=$ch bits=$bits")
        rate = le32(wav, o + 4).toInt
        ok = true
      } else if (id == "data") {
        // a second 'data' chunk is a malformed container, not an
        // extra-chunk variant the defensive walker should tolerate —
        // reject loudly (AudioSystem, the path this replaced, errors
        // on that shape too, so interop behavior is preserved)
        require(pcm == null, s"doc $docId: WAV with multiple data chunks")
        pcm = java.util.Arrays.copyOfRange(wav, p.toInt + 8, (p + 8 + size).toInt)
      }
      p += 8 + size + (size % 2)
    }
    require(ok && pcm != null, s"doc $docId: WAV missing fmt/data chunk")
    (rate, pcm)
  }
}

/** One-time JVM tuning for `javax.imageio`: the default ImageIO
  * read/write path spools every stream through a DISK-cached
  * `ImageInputStream` (a temp file per image — pure overhead for the
  * in-memory blobs every codec here decodes). Referenced lazily from
  * each codec pass so it runs once per executor JVM. */
object ImageIoTuning extends Serializable {
  @transient lazy val ensure: Unit = javax.imageio.ImageIO.setUseCache(false)
}

/** Minimal-but-valid AVI (RIFF) container support for MJPEG video —
  * the same chunk-walker discipline as the JDK's RIFF/WAVE path that
  * backs [[WavCodec]], written out because the JDK ships no AVI
  * demuxer. Layout follows the public AVI RIFF spec (Microsoft
  * "AVI RIFF File Reference"): `RIFF('AVI ' LIST('hdrl' 'avih'
  * LIST('strl' 'strh' 'strf')) LIST('movi' '00dc'…) 'idx1')`, all
  * sizes little-endian, chunks padded to even offsets. The writer
  * emits one video stream ('vids'/'MJPG', 30 fps) with a keyframe
  * index; the reader is a defensive walker — it verifies the RIFF
  * and 'AVI ' magics, scans top-level chunks for the 'movi' list,
  * recurses into 'rec ' sublists, honors pad bytes, and yields every
  * `##dc`/`##db` frame chunk as an opaque byte slice for the caller
  * to decode.
  */
object AviMjpeg {
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private final class W {
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(fourcc(s))
    def u32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def bytes(b: Array[Byte]): Unit = bos.write(b)
  }

  /** One MJPEG video stream, `frames` = already-encoded JPEG images
    * of identical `width`×`height`, 30 fps. */
  def writeAvi(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max
    def chunk(id: String, body: W => Unit): Array[Byte] = {
      val w = new W; body(w)
      val payload = w.bos.toByteArray
      val out = new W
      out.cc(id); out.u32(payload.length.toLong); out.bytes(payload)
      if (payload.length % 2 == 1) out.bos.write(0) // even alignment
      out.bos.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val out = new W
      out.cc("LIST"); out.u32(4L + body.length); out.cc(kind); out.bytes(body)
      out.bos.toByteArray
    }
    val avih = chunk("avih", w => {
      w.u32(33333L); w.u32(30L * maxFrame) // usec/frame, max bytes/sec
      w.u32(0L); w.u32(0x10L)              // padding, AVIF_HASINDEX
      w.u32(frames.length.toLong); w.u32(0L); w.u32(1L) // frames, initial, streams
      w.u32(maxFrame.toLong); w.u32(width.toLong); w.u32(height.toLong)
      (1 to 4).foreach(_ => w.u32(0L))     // reserved
    })
    val strh = chunk("strh", w => {
      w.cc("vids"); w.cc("MJPG")
      w.u32(0L); w.u16(0); w.u16(0); w.u32(0L) // flags, priority, language, initial
      w.u32(1L); w.u32(30L); w.u32(0L)          // scale, rate, start
      w.u32(frames.length.toLong); w.u32(maxFrame.toLong)
      w.u32(0xffffffffL); w.u32(0L)             // quality = -1, samplesize
      w.u16(0); w.u16(0); w.u16(width); w.u16(height) // rcFrame
    })
    val strf = chunk("strf", w => {
      w.u32(40L); w.u32(width.toLong); w.u32(height.toLong)
      w.u16(1); w.u16(24); w.cc("MJPG")
      w.u32(width.toLong * height * 3); w.u32(0L); w.u32(0L); w.u32(0L); w.u32(0L)
    })
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frameChunks = frames.map(f => chunk("00dc", _.bytes(f)))
    val movi = list("movi", frameChunks.reduce(_ ++ _))
    // idx1 offsets are relative to the 'movi' fourcc position
    var off = 4L
    val idxEntries = new W
    frames.zip(frameChunks).foreach { case (f, c) =>
      idxEntries.cc("00dc"); idxEntries.u32(0x10L) // AVIIF_KEYFRAME
      idxEntries.u32(off); idxEntries.u32(f.length.toLong)
      off += c.length
    }
    val idx1 = chunk("idx1", _.bytes(idxEntries.bos.toByteArray))
    val payload = hdrl ++ movi ++ idx1
    val out = new W
    out.cc("RIFF"); out.u32(4L + payload.length); out.cc("AVI ")
    out.bytes(payload)
    out.bos.toByteArray
  }

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def ccAt(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** All `##dc`/`##db` frame payloads of the (first) 'movi' list, in
    * stream order. Throws on a non-AVI or truncated container. */
  def readFrames(avi: Array[Byte]): Seq[Array[Byte]] = {
    require(avi.length >= 12 && ccAt(avi, 0) == "RIFF" && ccAt(avi, 8) == "AVI ",
      s"not an AVI container (${avi.length} bytes)")
    val riffEnd = math.min(avi.length.toLong, 8L + le32(avi, 4))
    val frames = Seq.newBuilder[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    def walkFrames(from: Long, to: Long): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = ccAt(avi, p.toInt)
        val size = le32(avi, p.toInt + 4)
        require(p + 8 + size <= to, s"truncated chunk '$id' at $p")
        if (id == "LIST" && size >= 4 && ccAt(avi, p.toInt + 8) == "rec ")
          walkFrames(p + 12, p + 8 + size)
        else if (isFrameId(id))
          frames += java.util.Arrays.copyOfRange(avi, p.toInt + 8, (p + 8 + size).toInt)
        p += 8 + size + (size % 2) // chunks align to even offsets
      }
    }
    var p = 12L
    var found = false
    while (!found && p + 8 <= riffEnd) {
      val id = ccAt(avi, p.toInt)
      val size = le32(avi, p.toInt + 4)
      require(p + 8 + size <= riffEnd, s"truncated chunk '$id' at $p")
      if (id == "LIST" && size >= 4 && ccAt(avi, p.toInt + 8) == "movi") {
        walkFrames(p + 12, p + 8 + size)
        found = true
      }
      p += 8 + size + (size % 2)
    }
    require(found, "no 'movi' list in AVI container")
    frames.result()
  }

  /** JPEG-encode at libjpeg quality 100 (compression quality 1.0 →
    * all-ones quantization tables). At this setting a frame built of
    * solid gray 16×16-aligned bands ROUND-TRIPS EXACTLY: gray maps to
    * (Y, 128, 128) exactly under libjpeg's fixed-point color
    * transform (the Y weights sum to FIX(1.0) and the chroma weights
    * cancel), constant MCUs have zero AC energy, and DC survives
    * quantization step 1 — so decoded pixel sums are arithmetic the
    * DuckDB oracle can replay. Pinned empirically for all 256 gray
    * values in `MultimodalSuite`.
    */
  def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    ImageIoTuning.ensure
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    ios.flush()
    bos.toByteArray
  }
}

/** REAL video codec: MJPEG-in-AVI over the JDK's `javax.imageio` —
  * [[AviMjpeg.readFrames]] walks the RIFF container, each `00dc`
  * frame decodes through the built-in JPEG reader, and the feature
  * vector aggregates the decoded bitmaps exactly as [[ImageIoCodec]]
  * does for stills: `[width, height, sumR, sumG, sumB]` with the
  * channel sums accumulated ACROSS frames. Geometry must be
  * consistent across frames (one video stream). Sums stay exact in
  * Float below 2²⁴ — the q221 clips peak below 2×10⁶. `n_frames` is
  * the real decoded frame count, the knob [[ByteBlockCodec]] could
  * only fake.
  */
final class AviMjpegCodec(val featureDim: Int = 8) extends MediaCodec {
  require(featureDim >= 5, "featureDim must fit [w, h, sumR, sumG, sumB]")
  override val mediaType: String = "video/x-msvideo"

  override def decode(blob: MediaBlob): MediaFeatures = {
    ImageIoTuning.ensure
    val frames = AviMjpeg.readFrames(blob.data)
    require(frames.nonEmpty, s"doc ${blob.doc_id}: AVI with no frames")
    var w = -1; var h = -1
    var sr = 0L; var sg = 0L; var sb = 0L
    frames.foreach { jpg =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      require(img != null, s"undecodable MJPEG frame for doc ${blob.doc_id}")
      if (w < 0) { w = img.getWidth; h = img.getHeight }
      else require(img.getWidth == w && img.getHeight == h,
        s"doc ${blob.doc_id}: frame geometry drift ${img.getWidth}x${img.getHeight} vs ${w}x$h")
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
    }
    val feature = new Array[Float](featureDim)
    feature(0) = w.toFloat
    feature(1) = h.toFloat
    feature(2) = sr.toFloat
    feature(3) = sg.toFloat
    feature(4) = sb.toFloat
    MediaFeatures(blob.doc_id, mediaType, blob.data.length.toLong,
      frames.length, blob.data.take(4), feature)
  }
}

object Multimodal {

  /** Batched partition pass: decodes `batchSize` blobs at a time with
    * one codec per partition — the exact batch shape a vectorized
    * (Arrow/Pandas-style) UDF would use, so a columnar decoder drops
    * in without plan changes.
    */
  def extractFeatures(blobs: Dataset[MediaBlob], codec: MediaCodec,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would decode the whole batch in one native call
        batch.iterator.map(codec.decode)
      }
    }
  }

  /** `documents` as media blobs: UTF-8 text bytes stand in for image
    * payloads (same opaque-binary plumbing, no image libs here).
    */
  def documentBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), lit("text/utf-8").as("media_type"),
        encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
  }

  /** Feature table for the declared query: the oracle-expressible
    * columns of the decode (byte/frame geometry). The frame features
    * themselves are asserted in the multimodal test suite — SQL can't
    * see inside a blob.
    */
  def featureTable(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(documentBlobs(spark, sfDir), new ByteBlockCodec)
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("n_frames"))
      .orderBy(col("doc_id"))

  /** Synthetic PNG blobs, one per document: a `w×h` two-color
    * checkerboard whose geometry and palette derive arithmetically
    * from `doc_id`, PNG-encoded with `javax.imageio` inside the
    * partition pass. Deterministic by construction, so the *decoded*
    * pixel sums are SQL-recomputable — which is what lets a real
    * binary image decode sit behind a DuckDB oracle.
    */
  def syntheticPngBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        ImageIoTuning.ensure
        it.map { id =>
          val w = 1 + (id % 16).toInt
          val h = 1 + (id % 8).toInt
          val c0 = (((id % 256).toInt << 16)
            | (((id * 7) % 256).toInt << 8) | ((id * 13) % 256).toInt)
          val c1 = ((((id * 3 + 1) % 256).toInt << 16)
            | (((id * 5 + 2) % 256).toInt << 8) | ((id * 11 + 3) % 256).toInt)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, if ((x + y) % 2 == 0) c0 else c1)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaBlob(id, "image/png", bos.toByteArray)
        }
      }
  }

  /** q108: PNG-encode → batched `ImageIoCodec` decode → per-channel
    * pixel sums. Every output value passed through a real PNG byte
    * stream; the oracle recomputes the checkerboard arithmetic the
    * image was built from. Embarrassingly parallel — one partition
    * pass, no shuffle until the final order.
    */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(syntheticPngBlobs(spark, sfDir), new ImageIoCodec)
      .toDF()
      .select(col("doc_id"),
        element_at(col("feature"), 1).cast("int").as("width"),
        element_at(col("feature"), 2).cast("int").as("height"),
        element_at(col("feature"), 3).cast("bigint").as("sum_r"),
        element_at(col("feature"), 4).cast("bigint").as("sum_g"),
        element_at(col("feature"), 5).cast("bigint").as("sum_b"))
      .orderBy(col("doc_id"))

  val q108Sql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    1 + doc_id % 16 AS w, 1 + doc_id % 8 AS h,
      |    doc_id % 256 AS r0, (doc_id * 7) % 256 AS g0, (doc_id * 13) % 256 AS b0,
      |    (doc_id * 3 + 1) % 256 AS r1, (doc_id * 5 + 2) % 256 AS g1,
      |    (doc_id * 11 + 3) % 256 AS b1
      |  FROM documents),
      |c AS (
      |  SELECT *, (w * h + (w % 2) * (h % 2)) // 2 AS n0,
      |    w * h - (w * h + (w % 2) * (h % 2)) // 2 AS n1
      |  FROM g)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(n0 * r0 + n1 * r1 AS BIGINT) AS sum_r,
      |  CAST(n0 * g0 + n1 * g1 AS BIGINT) AS sum_g,
      |  CAST(n0 * b0 + n1 * b1 AS BIGINT) AS sum_b
      |FROM c ORDER BY doc_id""".stripMargin

  /** Synthetic WAV blobs, one per document: a mono 16-bit PCM signal
    * whose length and sample values derive arithmetically from
    * `doc_id` (sample i = (i·k mod 2048) − 1024, k = 1 + doc_id mod
    * 7 — a sawtooth that exercises every sample position), packaged
    * into a real RIFF/WAVE container ([[Wav.writePcm16Mono]] — byte-
    * identical to AudioSystem's canonical layout) inside
    * the partition pass. Deterministic by construction, so the
    * decoded sample statistics are SQL-recomputable — q108's
    * real-codec-under-an-oracle trick, for audio.
    */
  def syntheticWavBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 64 + (id % 128).toInt
          val k = 1 + (id % 7).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = ((i * k) % 2048) - 1024
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          MediaBlob(id, "audio/wav", Wav.writePcm16Mono(pcm, 8000))
        }
      }
  }

  /** q121: WAV-encode → batched `WavCodec` decode → exact sample
    * statistics. Every output value passed through a real RIFF/WAVE
    * byte stream; the oracle recomputes the sawtooth arithmetic the
    * signal was built from. Embarrassingly parallel — one partition
    * pass, no shuffle until the final order.
    */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(syntheticWavBlobs(spark, sfDir), new WavCodec)
      .toDF()
      .select(col("doc_id"),
        element_at(col("feature"), 1).cast("int").as("sample_rate"),
        element_at(col("feature"), 2).cast("int").as("n_samples"),
        element_at(col("feature"), 3).cast("bigint").as("sum_s"),
        element_at(col("feature"), 4).cast("bigint").as("sum_abs"),
        element_at(col("feature"), 5).cast("bigint").as("max_abs"))
      .orderBy(col("doc_id"))

  val q121Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 64 + doc_id % 128 AS n, 1 + doc_id % 7 AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n, ((i * k) % 2048) - 1024 AS v
      |  FROM p CROSS JOIN range(0, 192) t(i) WHERE i < n)
      |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(n AS INT) AS n_samples,
      |  CAST(SUM(v) AS BIGINT) AS sum_s,
      |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
      |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs
      |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin

  val q44Sql: String =
    """SELECT doc_id, 'text/utf-8' AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST((octet_length(encode(text)) + 255) // 256 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Average-hash (aHash) perceptual fingerprints over REAL decoded
    * images: nearest-neighbor-sample the decoded bitmap on an 8×8
    * grid, take per-sample brightness g = r+g+b, and set bit i iff
    * 64·g_i > Σg — the integer-exact form of "brighter than the
    * mean" (no division, no floats, so the oracle can replay it).
    * The hash is emitted as a 64-char '0'/'1' string: portable across
    * engines, no sign-bit pitfalls, and an equi-join/group key exactly
    * like the SimHash band keys (q30).
    *
    * Same batched partition pass as [[extractFeatures]] — one decoder
    * per partition, embarrassingly parallel, no shuffle.
    */
  def perceptualHashes(blobs: Dataset[MediaBlob], batchSize: Int = 64): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      ImageIoTuning.ensure
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { blob =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob.data))
          require(img != null, s"undecodable image blob for doc ${blob.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          val g = new Array[Long](64)
          var i = 0
          while (i < 64) {
            val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
            g(i) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          val tot = g.sum
          val sb = new StringBuilder(64)
          i = 0
          while (i < 64) {
            sb.append(if (64 * g(i) > tot) '1' else '0')
            i += 1
          }
          (blob.doc_id, sb.toString)
        }
      }
    }.toDF("doc_id", "phash")
  }

  /** q138: PNG-encode → real `javax.imageio` decode → aHash → group
    * by fingerprint — perceptual image dedup, the multimodal twin of
    * exact text dedup (q27): images whose decoded pixel structure
    * hashes identically collapse to one representative (min doc_id
    * survivor, same policy). Every fingerprint bit passes through
    * real compressed PNG bytes; the oracle replays the checkerboard
    * + sampling + threshold arithmetic the images were built from.
    *
    * Scale shape: decode is partition-local; the only shuffle is the
    * group-by on the 64-bit fingerprint — exact dedup's hash-only
    * shuffle, with the hash 64 characters instead of 256 bits. A
    * hamming-tolerant variant would band the fingerprint exactly as
    * q30 bands SimHash — same machinery, already built.
    */
  def imagePerceptualDedup(spark: SparkSession, sfDir: String): DataFrame =
    perceptualHashes(syntheticPngBlobs(spark, sfDir))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("rep_id"),
        sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy(col("phash"))

  val q138Sql: String =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 8 AS h,
      |    (doc_id % 256) + ((doc_id * 7) % 256) + ((doc_id * 13) % 256) AS s0,
      |    ((doc_id * 3 + 1) % 256) + ((doc_id * 5 + 2) % 256)
      |      + ((doc_id * 11 + 3) % 256) AS s1
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    [CASE WHEN ((((i % 8) * w) // 8) + (((i // 8) * h) // 8)) % 2 = 0
      |          THEN s0 ELSE s1 END FOR i IN range(0, 64)] AS gs
      |  FROM g),
      |t AS (SELECT doc_id, gs, list_sum(gs) AS tot FROM b),
      |hsh AS (
      |  SELECT doc_id,
      |    array_to_string(
      |      list_transform(gs, v -> CASE WHEN 64 * v > tot
      |                                   THEN '1' ELSE '0' END), '') AS phash
      |  FROM t)
      |SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_images,
      |  CAST(MIN(doc_id) AS BIGINT) AS rep_id,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
      |FROM hsh GROUP BY phash ORDER BY phash""".stripMargin

  /** Nearest-neighbor resize of REAL decoded images to `num/den` of
    * each axis (floor, min 1 px) — the thumbnail/preprocessing verb of
    * an image-training pipeline, next to decode (q108) and fingerprint
    * (q138). The resized bitmap is MATERIALIZED (a `BufferedImage` a
    * sink could re-encode), then reduced to per-channel sums so every
    * resized pixel is value-checked. NN source mapping is the integer
    * floor `sx = x'·w ÷ w'` — division-free to replay in SQL, and the
    * standard O(1)-per-pixel resize a 100 TB media pass would run
    * (area/bilinear kernels plug into the same partition pass).
    *
    * Same batched partition shape as [[extractFeatures]]: one decoder
    * per partition, embarrassingly parallel, no shuffle.
    */
  def resizeStats(blobs: Dataset[MediaBlob], num: Int, den: Int,
                  batchSize: Int = 64): DataFrame = {
    require(num >= 1 && den >= 1, "resize ratio must be positive")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      ImageIoTuning.ensure
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { blob =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(blob.data))
          require(img != null, s"undecodable image blob for doc ${blob.doc_id}")
          val w = img.getWidth
          val h = img.getHeight
          val w2 = math.max(1, w * num / den)
          val h2 = math.max(1, h * num / den)
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h2) {
            val sy = y * h / h2
            var x = 0
            while (x < w2) {
              out.setRGB(x, y, img.getRGB(x * w / w2, sy))
              x += 1
            }
            y += 1
          }
          var sr = 0L; var sg = 0L; var sb = 0L
          y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val rgb = out.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          (blob.doc_id, w2, h2, sr, sg, sb)
        }
      }
    }.toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** q169: PNG-encode → real decode → NN-resize to 2/3 of each axis →
    * per-channel sums of the RESIZED bitmap. The oracle replays the
    * checkerboard arithmetic through the same floor source-mapping, so
    * the resize geometry and every surviving pixel are value-checked
    * end to end through real compressed bytes.
    */
  def imageResize(spark: SparkSession, sfDir: String): DataFrame =
    resizeStats(syntheticPngBlobs(spark, sfDir), num = 2, den = 3)
      .select(col("doc_id"), col("width").cast("int").as("width"),
        col("height").cast("int").as("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy(col("doc_id"))

  val q169Sql: String =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 8 AS h,
      |    doc_id % 256 AS r0, (doc_id * 7) % 256 AS g0, (doc_id * 13) % 256 AS b0,
      |    (doc_id * 3 + 1) % 256 AS r1, (doc_id * 5 + 2) % 256 AS g1,
      |    (doc_id * 11 + 3) % 256 AS b1
      |  FROM documents),
      |r AS (
      |  SELECT *, GREATEST(1, (w * 2) // 3) AS w2, GREATEST(1, (h * 2) // 3) AS h2
      |  FROM g),
      |px AS (
      |  SELECT doc_id, w2, h2,
      |    CASE WHEN ((x.i * w) // w2 + (y.i * h) // h2) % 2 = 0
      |         THEN r0 ELSE r1 END AS pr,
      |    CASE WHEN ((x.i * w) // w2 + (y.i * h) // h2) % 2 = 0
      |         THEN g0 ELSE g1 END AS pg,
      |    CASE WHEN ((x.i * w) // w2 + (y.i * h) // h2) % 2 = 0
      |         THEN b0 ELSE b1 END AS pb
      |  FROM r CROSS JOIN range(0, 10) x(i) CROSS JOIN range(0, 5) y(i)
      |  WHERE x.i < w2 AND y.i < h2)
      |SELECT doc_id, CAST(w2 AS INT) AS width, CAST(h2 AS INT) AS height,
      |  CAST(SUM(pr) AS BIGINT) AS sum_r,
      |  CAST(SUM(pg) AS BIGINT) AS sum_g,
      |  CAST(SUM(pb) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id, w2, h2 ORDER BY doc_id""".stripMargin

  /** Stride resampling (decimation by `k`) of REAL decoded WAV audio —
    * the audio analogue of [[resizeStats]]: keep every `k`-th PCM
    * sample and emit exact statistics of the RESAMPLED signal (new
    * rate = rate/k). Plain decimation is the deterministic skeleton a
    * production resampler fills with an anti-aliasing polyphase filter
    * — the partition pass, batch shape and output contract are
    * identical, and the stride arithmetic is exactly replayable in
    * SQL. Same batched partition pass, no shuffle.
    */
  def resampleStats(blobs: Dataset[MediaBlob], k: Int,
                    batchSize: Int = 64): DataFrame = {
    require(k >= 1, "decimation factor must be >= 1")
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { blob =>
          val (rate, pcm) = Wav.readPcm16Mono(blob.data, blob.doc_id)
          val n = pcm.length / 2
          var sum = 0L; var sumAbs = 0L; var maxAbs = 0L; var n2 = 0
          var i = 0
          while (i < n) {
            val s = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
            sum += s
            val a = math.abs(s)
            sumAbs += a
            if (a > maxAbs) maxAbs = a
            n2 += 1
            i += k
          }
          (blob.doc_id, rate / k, n2, sum, sumAbs, maxAbs)
        }
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "sum_s", "sum_abs", "max_abs")
  }

  /** q170: WAV-encode → real decode → decimate by 2 → exact resampled
    * statistics. The oracle replays the sawtooth arithmetic over the
    * strided index set, so the resampler's sample selection and every
    * surviving sample value are checked through real RIFF/WAVE bytes.
    */
  def audioResample(spark: SparkSession, sfDir: String): DataFrame =
    resampleStats(syntheticWavBlobs(spark, sfDir), k = 2)
      .orderBy(col("doc_id"))

  /** Q15 windowed-sinc low-pass taps for decimation by 2: 17-tap
    * Hann-windowed sinc at cutoff π/2, DC-normalized then rounded
    * ONCE to the 2¹⁵ lattice (Σ = 32767) — fixed integer constants,
    * identical literals in the partition pass and the oracle SQL, so
    * the filter arithmetic is exactly replayable in any engine. Even
    * offsets are sinc zeros by construction (the half-band property:
    * nearly half the multiplies vanish). */
  private[multimodal] val HalfBandTapsQ15: Array[Int] = Array(
    0, -57, 0, 643, 0, -2400, 0, 10018, 16359,
    10018, 0, -2400, 0, 643, 0, -57, 0)

  /** Polyphase anti-aliasing decimation by `k` of REAL decoded WAV
    * audio — the production filler for [[resampleStats]]'s documented
    * stride skeleton: output sample j is the integer FIR convolution
    * `y_j = ⌊(Σ_t H[t]·x[j·k + t − c] + 2¹⁴) / 2¹⁵⌋` (c = center tap,
    * zero-padded at the boundaries, floor-div requantization back to
    * sample scale), with `tapsQ15` a windowed-sinc low-pass rounded
    * once to the Q15 integer lattice so every engine replays the
    * arithmetic bit-for-bit — no float accumulation anywhere. Only
    * the `n/k` output phases are computed (the polyphase identity:
    * filter AFTER decimation indexing, never on discarded samples).
    *
    * Same batched partition pass as [[resampleStats]]: one decoder
    * per partition, embarrassingly parallel, no shuffle; at 100 TB
    * this is the map-side shape a vectorized-UDF audio pipeline
    * takes, taps broadcast as plain task-closure constants.
    */
  def polyphaseResampleStats(blobs: Dataset[MediaBlob], k: Int,
                             tapsQ15: Array[Int],
                             batchSize: Int = 64): DataFrame = {
    require(k >= 1, "decimation factor must be >= 1")
    require(tapsQ15.length % 2 == 1, "taps must have a center (odd length)")
    import blobs.sparkSession.implicits._
    val taps = tapsQ15.clone()
    val c = (taps.length - 1) / 2
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { blob =>
          val (rate, pcm) = Wav.readPcm16Mono(blob.data, blob.doc_id)
          val n = pcm.length / 2
          def sample(i: Int): Long =
            if (i < 0 || i >= n) 0L
            else ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)).toLong
          var sum = 0L; var sumAbs = 0L; var maxAbs = 0L; var nOut = 0
          var j = 0
          while (j * k < n) {
            var acc = 0L
            var t = 0
            while (t < taps.length) {
              if (taps(t) != 0) acc += taps(t) * sample(j * k + t - c)
              t += 1
            }
            val y = Math.floorDiv(acc + 16384L, 32768L)
            sum += y
            val a = math.abs(y)
            sumAbs += a
            if (a > maxAbs) maxAbs = a
            nOut += 1
            j += 1
          }
          (blob.doc_id, rate / k, nOut, sum, sumAbs, maxAbs)
        }
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "sum_s", "sum_abs", "max_abs")
  }

  /** q182: WAV-encode → real decode → 17-tap half-band polyphase
    * low-pass → decimate by 2 → exact resampled statistics — q170's
    * documented skeleton filled with the anti-aliasing filter. The
    * oracle replays the full FIR convolution over the sawtooth
    * arithmetic (same Q15 tap literals, LEFT-JOIN zero padding,
    * floor-div requantization), so every resampled sample value is
    * checked through real RIFF/WAVE bytes.
    */
  def audioPolyphaseResample(spark: SparkSession, sfDir: String): DataFrame =
    polyphaseResampleStats(syntheticWavBlobs(spark, sfDir), k = 2,
      HalfBandTapsQ15)
      .orderBy(col("doc_id"))

  val q170Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 64 + doc_id % 128 AS n, 1 + doc_id % 7 AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n, ((i * k) % 2048) - 1024 AS v
      |  FROM p CROSS JOIN range(0, 192) t(i) WHERE i < n AND i % 2 = 0)
      |SELECT doc_id, CAST(4000 AS INT) AS sample_rate,
      |  CAST(COUNT(*) AS INT) AS n_samples,
      |  CAST(SUM(v) AS BIGINT) AS sum_s,
      |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
      |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val q182Sql: String = {
    val tapList = HalfBandTapsQ15.mkString("[", ", ", "]")
    s"""WITH p AS (
       |  SELECT doc_id, 64 + doc_id % 128 AS n, 1 + doc_id % 7 AS kk
       |  FROM documents),
       |x AS (
       |  SELECT doc_id, n, i, ((i * kk) % 2048) - 1024 AS v
       |  FROM p CROSS JOIN range(0, 192) t(i) WHERE i < n),
       |taps AS (
       |  SELECT CAST(t.i AS BIGINT) AS t, CAST($tapList[t.i + 1] AS BIGINT) AS h
       |  FROM range(0, ${HalfBandTapsQ15.length}) t(i)),
       |o AS (
       |  SELECT doc_id, n, t.j FROM p CROSS JOIN range(0, 96) t(j)
       |  WHERE j * 2 < n),
       |acc AS (
       |  SELECT o.doc_id, o.j,
       |    COALESCE(SUM(taps.h * x.v), 0) AS a
       |  FROM o CROSS JOIN taps
       |  LEFT JOIN x ON x.doc_id = o.doc_id AND x.i = o.j * 2 + taps.t - 8
       |  WHERE taps.h <> 0
       |  GROUP BY o.doc_id, o.j),
       |y AS (
       |  SELECT doc_id, CAST(floor((a + 16384) / 32768.0) AS BIGINT) AS y
       |  FROM acc)
       |SELECT doc_id, CAST(4000 AS INT) AS sample_rate,
       |  CAST(COUNT(*) AS INT) AS n_samples,
       |  CAST(SUM(y) AS BIGINT) AS sum_s,
       |  CAST(SUM(ABS(y)) AS BIGINT) AS sum_abs,
       |  CAST(MAX(ABS(y)) AS BIGINT) AS max_abs
       |FROM y GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q212: frame-level audio features over REAL decoded WAV bytes —
    * per-frame energy (Σ v² over 32-sample frames, final frame
    * partial) and signal zero crossings, the first stage of any
    * speech/VAD pipeline (frame energy gates voice activity, ZCR
    * separates voiced from unvoiced). All-integer arithmetic on the
    * 16-bit PCM samples, so the oracle replays the q121 sawtooth
    * generator exactly; every value still passes through a real
    * RIFF/WAVE byte stream and [[Wav]] decode. Same
    * embarrassingly-parallel partition pass as q121 — one decoder
    * pass per row, no shuffle before the final order.
    */
  def audioFrameFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val blobs = syntheticWavBlobs(spark, sfDir)
    import blobs.sparkSession.implicits._
    val frame = 32
    blobs.mapPartitions { it =>
      it.map { blob =>
        val (_, pcm) = Wav.readPcm16Mono(blob.data, blob.doc_id)
        val n = pcm.length / 2
        var zc = 0L; var total = 0L; var maxF = 0L; var nFrames = 0
        var cur = 0L; var prevNonNeg = true
        var i = 0
        while (i < n) {
          val s = (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)
          val nonNeg = s >= 0
          if (i > 0 && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          cur += s.toLong * s
          if (i % frame == frame - 1 || i == n - 1) {
            total += cur; if (cur > maxF) maxF = cur; cur = 0L; nFrames += 1
          }
          i += 1
        }
        (blob.doc_id, nFrames, zc, total, maxF)
      }
    }.toDF("doc_id", "n_frames", "zero_crossings", "energy_total",
        "energy_max_frame")
      .orderBy(col("doc_id"))
  }

  val q212Sql: String =
    """WITH p AS (
      |  SELECT doc_id, 64 + doc_id % 128 AS n, 1 + doc_id % 7 AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n, i, ((i * k) % 2048) - 1024 AS v
      |  FROM p CROSS JOIN range(0, 192) t(i) WHERE i < n),
      |fr AS (SELECT doc_id, i // 32 AS f, SUM(v * v) AS fe
      |       FROM s GROUP BY doc_id, i // 32),
      |fa AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_frames,
      |         CAST(SUM(fe) AS BIGINT) AS energy_total,
      |         CAST(MAX(fe) AS BIGINT) AS energy_max_frame
      |       FROM fr GROUP BY doc_id),
      |z AS (SELECT doc_id,
      |        CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
      |             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      |      FROM (SELECT doc_id, v,
      |              LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s)
      |      GROUP BY doc_id)
      |SELECT doc_id, n_frames, zero_crossings, energy_total, energy_max_frame
      |FROM fa JOIN z USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Synthetic MJPEG-in-AVI blobs, one clip per document: `nf` frames
    * of `w×h` gray video, each frame split into 16-pixel-tall solid
    * bands whose gray value derives arithmetically from (doc_id,
    * frame, band). Every frame is JPEG-compressed at quality 1.0
    * ([[AviMjpeg.encodeJpeg]] — the setting under which 16px-aligned
    * gray bands round-trip EXACTLY, pinned in `MultimodalSuite`) and
    * muxed into a real RIFF/AVI container inside the partition pass.
    * Deterministic by construction, so the decoded per-channel pixel
    * sums are SQL-recomputable — q108's real-codec-under-an-oracle
    * trick, for video.
    */
  def syntheticAviBlobs(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nf = 1 + (id % 5).toInt
          val w = 16 * (1 + (id % 3).toInt)
          val h = 16 * (1 + (id % 2).toInt)
          val frames = (0 until nf).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              val v = ((id * 31 + f * 17 + (y / 16) * 7) % 256).toInt
              val rgb = (v << 16) | (v << 8) | v
              var x = 0
              while (x < w) { img.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            AviMjpeg.encodeJpeg(img)
          }
          MediaBlob(id, "video/x-msvideo", AviMjpeg.writeAvi(frames, w, h))
        }
      }
  }

  /** q221: MJPEG-encode + AVI-mux → RIFF walk + batched per-frame
    * `javax.imageio` JPEG decode → frame count, geometry and
    * across-frame per-channel pixel sums. Every output value passes
    * through a real compressed AVI byte stream; the oracle replays
    * the band arithmetic the clips were built from (exact because
    * quality-1.0 JPEG round-trips the aligned gray bands — see
    * [[AviMjpeg.encodeJpeg]]). Embarrassingly parallel — one
    * partition pass, no shuffle until the final order. This retires
    * the engine's last stubbed modality: all four media families
    * (image/audio/video/opaque) now decode real bytes.
    */
  def videoDecode(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(syntheticAviBlobs(spark, sfDir), new AviMjpegCodec)
      .toDF()
      .select(col("doc_id"), col("n_frames"),
        element_at(col("feature"), 1).cast("int").as("width"),
        element_at(col("feature"), 2).cast("int").as("height"),
        element_at(col("feature"), 3).cast("bigint").as("sum_r"),
        element_at(col("feature"), 4).cast("bigint").as("sum_g"),
        element_at(col("feature"), 5).cast("bigint").as("sum_b"))
      .orderBy(col("doc_id"))

  val q221Sql: String =
    """WITH g AS (
      |  SELECT doc_id, 1 + doc_id % 5 AS nf,
      |    16 * (1 + doc_id % 3) AS w, 16 * (1 + doc_id % 2) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, nf, w, h,
      |    (doc_id * 31 + f.i * 17 + b.i * 7) % 256 AS v
      |  FROM g CROSS JOIN range(0, 5) f(i) CROSS JOIN range(0, 2) b(i)
      |  WHERE f.i < nf AND b.i < h // 16)
      |SELECT doc_id, CAST(MAX(nf) AS INT) AS n_frames,
      |  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
      |  CAST(SUM(w * 16 * v) AS BIGINT) AS sum_r,
      |  CAST(SUM(w * 16 * v) AS BIGINT) AS sum_g,
      |  CAST(SUM(w * 16 * v) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q44_multimodal_features", featureTable _, Some(q44Sql)),
    ("q221_video_mjpeg_decode", videoDecode _, Some(q221Sql)),
    ("q108_imageio_decode", imageDecode _, Some(q108Sql)),
    ("q121_wav_decode", audioDecode _, Some(q121Sql)),
    ("q138_image_phash_dedup", imagePerceptualDedup _, Some(q138Sql)),
    ("q169_image_resize", imageResize _, Some(q169Sql)),
    ("q170_audio_resample", audioResample _, Some(q170Sql)),
    ("q182_audio_polyphase_resample", audioPolyphaseResample _, Some(q182Sql)),
    ("q212_audio_frame_features", audioFrameFeatures _, Some(q212Sql)))
}
