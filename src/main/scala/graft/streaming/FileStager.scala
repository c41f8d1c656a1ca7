package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic micro-batch staging for file-source streaming tests
  * and declared streaming queries (q171/q183/q198/q206): writes one
  * parquet FILE per intended micro-batch into `base/src` with a
  * strictly-ordered mtime pinned in the past — Structured Streaming's
  * file source batches by mtime, so with `maxFilesPerTrigger=1` each
  * staged file becomes exactly one micro-batch, in the staged order.
  * Construction wipes `base` so a rerun never replays a previous
  * run's checkpoint against new data.
  */
final class FileStager private (spark: SparkSession, base: String) {
  private val hfs = new org.apache.hadoop.fs.Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  hfs.delete(new org.apache.hadoop.fs.Path(base), true)
  val srcDir: String = s"$base/src"
  hfs.mkdirs(new org.apache.hadoop.fs.Path(srcDir))

  def stage(slice: DataFrame, name: String, mtime: Long): Unit = {
    val tmp = s"$base/tmp_$name"
    slice.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = hfs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*"))(0).getPath
    val dest = new org.apache.hadoop.fs.Path(s"$srcDir/$name.parquet")
    hfs.rename(part, dest)
    hfs.setTimes(dest, mtime, -1)
    hfs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }
}

object FileStager {
  def apply(spark: SparkSession, base: String): FileStager =
    new FileStager(spark, base)
}
