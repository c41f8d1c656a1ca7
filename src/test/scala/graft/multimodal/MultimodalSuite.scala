package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing with hand-computed fixtures: blob geometry,
  * frame features, batch boundaries, schema.
  */
class MultimodalSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private val codec = new FakeFrameCodec

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
}
