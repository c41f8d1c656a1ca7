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
  * partition, columnar-friendly output). The *decode* itself is a
  * deterministic STUB ([[FakeFrameCodec]]): this environment has no
  * image/audio libraries, so a real codec (libjpeg/ffmpeg binding)
  * would plug in behind [[MediaCodec]] without touching any plumbing.
  */
final case class MediaBlob(doc_id: Long, media_type: String, data: Array[Byte])

final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long, n_frames: Int,
    header: Array[Byte], feature: Array[Float])

trait MediaCodec extends Serializable {
  def mediaType: String
  def decode(blob: MediaBlob): MediaFeatures
}

/** STUB codec — deterministic fake standing in for a real decoder.
  * Frames are 256-byte blocks; the "feature" is the mean byte value of
  * `featureDim` SAMPLED frames (every `frameStride`-th — the
  * frame-sampling knob a video pipeline needs: stride 1 reads the
  * clip head, stride k spreads the same feature budget across k× the
  * duration); the header is the first 4 bytes.
  */
final class FakeFrameCodec(val mediaType: String = "fake/frames",
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
    extractFeatures(documentBlobs(spark, sfDir), new FakeFrameCodec)
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("n_frames"))
      .orderBy(col("doc_id"))

  val q44Sql: String =
    """SELECT doc_id, 'text/utf-8' AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST((octet_length(encode(text)) + 255) // 256 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q44_multimodal_features", featureTable _, Some(q44Sql)))
}
