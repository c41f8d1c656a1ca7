package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing with hand-computed fixtures: blob geometry,
  * frame features, batch boundaries, schema.
  */
class MultimodalSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private val codec = new ByteBlockCodec

  test("codec: frame geometry and mean-byte features") {
    val bytes = Array.tabulate(300)(i => (i % 256).toByte) // 2 frames: 256 + 44
    val f = codec.decode(MediaBlob(7L, "fake/frames", bytes))
    assert(f.n_bytes == 300 && f.n_frames == 2)
    assert(f.header.toSeq == bytes.take(4).toSeq)
    // frame 0: mean of 0..255 = 127.5; frame 1: bytes 256..299 → values 0..43 → mean 21.5
    assert(f.feature(0) == 127.5f)
    assert(f.feature(1) == 21.5f)
    assert(f.feature(2) == 0.0f) // beyond payload
  }

  test("empty and sub-frame blobs") {
    val f = codec.decode(MediaBlob(1L, "x", Array[Byte](10, 20)))
    assert(f.n_bytes == 2 && f.n_frames == 1 && f.feature(0) == 15.0f)
    val empty = codec.decode(MediaBlob(2L, "x", Array.empty[Byte]))
    assert(empty.n_bytes == 0 && empty.n_frames == 0 && empty.feature.forall(_ == 0f))
  }

  test("distributed batched extraction preserves rows across batch boundaries") {
    val s = spark
    import s.implicits._
    val blobs = s.range(150) // not a multiple of the batch size
      .map(i => MediaBlob(i, "fake/frames", Array.fill(i.toInt + 1)(i.toByte)))
      .repartition(4)
    val out = Multimodal.extractFeatures(blobs, codec, batchSize = 64).collect()
    assert(out.length == 150)
    val byId = out.map(f => f.doc_id -> f).toMap
    assert(byId(10L).n_bytes == 11 && byId(10L).feature(0) == 10.0f)
    assert(byId(149L).n_bytes == 150)
  }

  test("feature table: schema and determinism over documents") {
    val df = Multimodal.featureTable(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("doc_id", "media_type", "n_bytes", "n_frames"))
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[String]("media_type") == "text/utf-8"))
    val again = Multimodal.featureTable(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("frame sampling: stride spreads the feature budget over the clip") {
    // 4 frames of constant bytes 1,2,3,4 → stride 1 reads frames 0,1;
    // stride 2 reads frames 0,2 — sampling, not truncation
    val bytes = Array.tabulate(4 * 256)(i => (i / 256 + 1).toByte)
    val blob = MediaBlob(1L, "x", bytes)
    val dense = new ByteBlockCodec(featureDim = 2).decode(blob)
    val strided = new ByteBlockCodec(frameStride = 2, featureDim = 2).decode(blob)
    assert(dense.feature.toSeq == Seq(1.0f, 2.0f))
    assert(strided.feature.toSeq == Seq(1.0f, 3.0f))
    assert(dense.n_frames == 4 && strided.n_frames == 4)
  }

  test("ImageIoCodec: decodes real PNG bytes back to exact pixel sums") {
    // hand-built 3×2 image: row 0 = (10,20,30),(40,50,60),(70,80,90),
    // row 1 = (1,2,3),(4,5,6),(7,8,9) — encode with ImageIO, decode
    // with the codec, expect exact channel sums and geometry
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq(
      (0, 0, 10, 20, 30), (1, 0, 40, 50, 60), (2, 0, 70, 80, 90),
      (0, 1, 1, 2, 3), (1, 1, 4, 5, 6), (2, 1, 7, 8, 9))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // PNG magic header survives the blob round-trip
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val f = new ImageIoCodec().decode(MediaBlob(42L, "image/png", png))
    assert(f.feature.toSeq.take(5) ==
      Seq(3.0f, 2.0f, (10 + 40 + 70 + 1 + 4 + 7).toFloat,
        (20 + 50 + 80 + 2 + 5 + 8).toFloat, (30 + 60 + 90 + 3 + 6 + 9).toFloat))
    assert(f.n_frames == 1 && f.n_bytes == png.length.toLong)
    assert(f.header.toSeq == png.take(4).toSeq)
  }

  test("q108: distributed PNG encode/decode matches the checkerboard arithmetic") {
    val rows = Multimodal.imageDecode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = 1 + (id % 16).toInt
      val h = 1 + (id % 8).toInt
      val n0 = (w * h + (w % 2) * (h % 2)) / 2
      val n1 = w * h - n0
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("sum_r") == n0 * (id % 256) + n1 * ((id * 3 + 1) % 256))
      assert(r.getAs[Long]("sum_g") == n0 * ((id * 7) % 256) + n1 * ((id * 5 + 2) % 256))
      assert(r.getAs[Long]("sum_b") == n0 * ((id * 13) % 256) + n1 * ((id * 11 + 3) % 256))
    }
  }

  test("WavCodec: decodes real WAV bytes back to exact sample statistics") {
    // hand-built 5-sample mono 16-bit PCM clip with negative, zero and
    // positive values — encode into a RIFF/WAVE container with
    // javax.sound.sampled, decode with the codec
    val samples = Seq(-1024, -1, 0, 7, 1023)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // RIFF magic survives the blob round-trip
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    val f = new WavCodec().decode(MediaBlob(42L, "audio/wav", wav))
    assert(f.feature.toSeq.take(5) == Seq(8000f, 5f,
      samples.sum.toFloat, samples.map(math.abs).sum.toFloat, 1024f))
    assert(f.n_frames == 5 && f.n_bytes == wav.length.toLong)
    assert(f.header.toSeq == wav.take(4).toSeq)
  }

  test("Wav mux/demux interops with javax AudioSystem both directions") {
    val samples = Seq(-1024, -1, 0, 7, 1023)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    // our writer's bytes are byte-identical to AudioSystem's canonical
    // output for the same PCM payload
    val ours = Wav.writePcm16Mono(pcm, 8000)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(ours.toSeq == bos.toByteArray.toSeq,
      "hand-rolled WAV must match AudioSystem's canonical layout")
    // AudioSystem decodes our writer's output
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.readAllBytes().toSeq == pcm.toSeq)
    // our reader decodes AudioSystem's output (and rejects garbage)
    val (rate, back) = Wav.readPcm16Mono(bos.toByteArray, 1L)
    assert(rate == 8000 && back.toSeq == pcm.toSeq)
    intercept[IllegalArgumentException] { Wav.readPcm16Mono("nope".getBytes, 2L) }
    intercept[IllegalArgumentException] {
      Wav.readPcm16Mono(ours.take(ours.length - 3), 3L) // truncated data chunk
    }
  }

  test("q121: distributed WAV encode/decode matches the sawtooth arithmetic") {
    val rows = Multimodal.audioDecode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 64 + (id % 128).toInt
      val k = 1 + (id % 7).toInt
      val vs = (0 until n).map(i => ((i * k) % 2048) - 1024)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Int]("n_samples") == n)
      assert(r.getAs[Long]("sum_s") == vs.sum.toLong)
      assert(r.getAs[Long]("sum_abs") == vs.map(math.abs).sum.toLong)
      assert(r.getAs[Long]("max_abs") == vs.map(math.abs).max.toLong)
    }
  }

  test("quality-1.0 JPEG round-trips aligned gray bands exactly (oracle premise)") {
    // the q221 oracle replays pre-encode arithmetic, which is only
    // sound if the lossy codec is exact on this input family — pin it
    // for every gray value and both band counts
    for (v0 <- 0 until 256 by 7; nb <- 1 to 2) {
      val w = 48; val h = 16 * nb
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (v0 + (y / 16) * 97) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(AviMjpeg.encodeJpeg(img)))
      for (y <- 0 until h; x <- 0 until w) {
        val v = (v0 + (y / 16) * 97) % 256
        assert((dec.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
          s"JPEG drift at ($x,$y) v=$v nb=$nb")
      }
    }
    // and the full 0..255 solid sweep, cheap at 8x8
    for (v <- 0 until 256) {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(AviMjpeg.encodeJpeg(img)))
      assert((dec.getRGB(3, 5) & 0xffffff) == ((v << 16) | (v << 8) | v))
    }
  }

  test("AVI container: mux/demux round-trips frame bytes, honors padding") {
    // odd-length frame payloads force the even-alignment pad path
    val frames = Seq(
      Array.tabulate(7)(i => i.toByte),
      Array.tabulate(256)(i => (255 - i).toByte),
      Array.tabulate(33)(i => (i * 3).toByte))
    val avi = AviMjpeg.writeAvi(frames, 16, 16)
    assert(avi.take(4).map(_.toChar).mkString == "RIFF")
    assert(avi.slice(8, 12).map(_.toChar).mkString == "AVI ")
    // declared RIFF size covers the file exactly
    val riffSize = (avi(4) & 0xffL) | ((avi(5) & 0xffL) << 8) |
      ((avi(6) & 0xffL) << 16) | ((avi(7) & 0xffL) << 24)
    assert(riffSize + 8 == avi.length.toLong)
    val back = AviMjpeg.readFrames(avi)
    assert(back.length == 3)
    back.zip(frames).foreach { case (b, f) => assert(b.toSeq == f.toSeq) }
    // defensive walker: garbage and truncation are rejected, not misread
    intercept[IllegalArgumentException] {
      AviMjpeg.readFrames("not an avi at all".getBytes)
    }
    // clipping only the trailing idx1 keeps every frame readable (the
    // walker stops at movi) — cut INTO the movi list to hit the
    // truncation guard (idx1 = 8 header + 3×16-byte entries = 56)
    intercept[IllegalArgumentException] {
      AviMjpeg.readFrames(avi.take(avi.length - 60))
    }
  }

  test("AviMjpegCodec: decodes real MJPEG-in-AVI bytes to exact frame stats") {
    // 2 frames of 32x32 gray video, each split into two 16px bands:
    // frame 0 bands 100/30, frame 1 bands 255/0
    val w = 32; val h = 32
    def frame(vTop: Int, vBot: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (y < 16) vTop else vBot
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      AviMjpeg.encodeJpeg(img)
    }
    val avi = AviMjpeg.writeAvi(Seq(frame(100, 30), frame(255, 0)), w, h)
    val f = new AviMjpegCodec().decode(MediaBlob(9L, "video/x-msvideo", avi))
    assert(f.n_frames == 2 && f.n_bytes == avi.length.toLong)
    assert(f.header.toSeq == avi.take(4).toSeq)
    val expect = (w * 16 * (100 + 30 + 255 + 0)).toFloat
    assert(f.feature.toSeq.take(5) == Seq(w.toFloat, h.toFloat, expect, expect, expect))
  }

  test("q221: distributed AVI encode/decode matches the band arithmetic") {
    val rows = Multimodal.videoDecode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nf = 1 + (id % 5).toInt
      val w = 16 * (1 + (id % 3).toInt)
      val h = 16 * (1 + (id % 2).toInt)
      val sum = (for (f <- 0 until nf; b <- 0 until h / 16)
        yield w.toLong * 16 * ((id * 31 + f * 17 + b * 7) % 256)).sum
      assert(r.getAs[Int]("n_frames") == nf)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("sum_r") == sum)
      assert(r.getAs[Long]("sum_g") == sum)
      assert(r.getAs[Long]("sum_b") == sum)
    }
  }

  test("extracted features are first-class vectors for similarity search") {
    // the multimodal → ANN hand-off: decode features, then run the
    // exact cosine top-k operator over them with no glue beyond a toDF
    val s = spark
    import s.implicits._
    val feats = Multimodal
      .extractFeatures(Multimodal.documentBlobs(s, "/root/testdata/sf0.001"), codec)
      .toDF()
      .where(org.apache.spark.sql.functions.expr(
        "aggregate(feature, cast(0 as double), (a, x) -> a + abs(x)) > 0"))
      .select($"doc_id", $"feature")
    val top1 = graft.llm.VectorSearch.cosineTopK(feats, "doc_id", "feature", k = 1)
    assert(top1.count() == feats.count())
    // cosine of mean-byte features is in [-1, 1] and deterministic
    val c = top1.select("cos").collect().map(_.getDouble(0))
    assert(c.forall(v => v >= -1.0000001 && v <= 1.0000001))
  }

  test("perceptual aHash: re-encoding invariant, structure sensitive") {
    val s = spark
    import s.implicits._
    def png(w: Int, h: Int, bright: Int, dark: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x + y) % 2 == 0) bright else dark)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // docs 1/2: same geometry+palette through two separate encode calls
    // (different byte streams) — the perceptual hash must collapse them.
    // doc 3: same palette, transposed geometry — must not collide.
    val blobs = Seq(
      MediaBlob(1L, "image/png", png(6, 4, 0xffffff, 0x000000)),
      MediaBlob(2L, "image/png", png(6, 4, 0xffffff, 0x000000)),
      MediaBlob(3L, "image/png", png(4, 6, 0xffffff, 0x000000)))
      .toDS()
    val got = Multimodal.perceptualHashes(blobs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got.values.forall(h => h.length == 64 && h.forall(c => c == '0' || c == '1')))
    // the brighter color occupies the even-parity sampled cells: bit 0 set
    assert(got(1L).head == '1')
  }

  test("resize at 1/1 is the identity: geometry and sums equal the decode") {
    val s = spark
    val blobs = Multimodal.syntheticPngBlobs(s, "/root/testdata/sf0.001")
    val full = Multimodal.imageDecode(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val same = Multimodal.resizeStats(blobs, num = 1, den = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(same == full, "1/1 resize must reproduce the decoded image exactly")
    // a real shrink reduces pixel count for every multi-pixel image
    val shrunk = Multimodal.resizeStats(blobs, num = 1, den = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong * r.getInt(2))).toMap
    full.foreach { case (id, (w, h, _, _, _)) =>
      assert(shrunk(id) <= w.toLong * h)
      assert(shrunk(id) >= 1L)
    }
  }

  test("resample at k=1 is the identity: stats equal the decode") {
    val s = spark
    val blobs = Multimodal.syntheticWavBlobs(s, "/root/testdata/sf0.001")
    val full = Multimodal.audioDecode(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val same = Multimodal.resampleStats(blobs, k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(same == full, "k=1 resample must reproduce the decoded stream exactly")
    // k=2 halves the rate and keeps ceil(n/2) samples
    val half = Multimodal.resampleStats(blobs, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    full.foreach { case (id, (rate, n, _, _, _)) =>
      assert(half(id) == ((rate / 2, (n + 1) / 2)))
    }
  }

  test("polyphase resample matches a plain-Scala FIR replay through real WAV") {
    val s = spark
    val taps = Multimodal.HalfBandTapsQ15
    // a pure unit-impulse tap set is the identity filter: polyphase
    // decimation with it must equal plain stride decimation
    val impulse = Array.fill(taps.length)(0)
    impulse((taps.length - 1) / 2) = 32768
    val blobs = Multimodal.syntheticWavBlobs(s, "/root/testdata/sf0.001")
    val strided = Multimodal.resampleStats(blobs, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ident = Multimodal.polyphaseResampleStats(blobs, k = 2, impulse)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(ident == strided,
      "impulse-tap polyphase must reduce to plain decimation")
    // the real half-band taps: replay the full convolution in Scala
    // from the sawtooth the blobs were built from
    val got = Multimodal.polyphaseResampleStats(blobs, k = 2, taps)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val c = (taps.length - 1) / 2
    val expected = got.keys.map { id =>
      val n = 64 + (id % 128).toInt
      val k = 1 + (id % 7).toInt
      def x(i: Int): Long =
        if (i < 0 || i >= n) 0L else (((i * k) % 2048) - 1024).toLong
      val ys = (0 until (n + 1) / 2).map { j =>
        val acc = taps.indices.map(t => taps(t).toLong * x(2 * j + t - c)).sum
        Math.floorDiv(acc + 16384L, 32768L)
      }
      id -> ((4000, ys.size, ys.sum, ys.map(math.abs).sum,
        if (ys.isEmpty) 0L else ys.map(math.abs).max))
    }.toMap
    assert(got == expected)
    // the low-pass genuinely filtered something: outputs differ from
    // plain decimation on at least one doc
    assert(got != strided)
  }
}
