package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Line-oriented text source/sink support — the interchange formats a
  * pipeline meets at its edges (JSONL exports, CSV drops), distinct
  * from the parquet it should live on internally.
  *
  * Both readers take an EXPLICIT schema: schema inference is a full
  * extra pass over the data at 100 TB (and type-unstable across
  * samples), so the engine treats "schema known" as part of the source
  * contract, exactly as parquet's footer makes it. Writes are
  * compressed (gzip) splittable-per-file: many files × moderate size,
  * the layout that keeps a 1000-executor read parallel even though
  * gzip itself is not splittable within a file.
  */
object TextFormats {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with full quoting so arbitrary text (commas, quotes — not
    * newlines; use JSONL for those) survives the roundtrip. The
    * whitespace options matter: Spark's CSV WRITER trims leading and
    * trailing whitespace by default, silently corrupting payloads. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** XML (Spark 4's built-in source, the spark-xml connector merged
    * upstream): one `<doc>` element per row. Entity escaping makes the
    * encoding lossless for arbitrary text (`&`, `<`, `>`, quotes), but
    * two defaults must be overridden or payload bytes silently change:
    * the reader trims element whitespace (`ignoreSurroundingSpaces`
    * defaults true) and both sides apply a value parser — the explicit
    * schema pins the types instead. */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", "doc").option("compression", "gzip")
      .save(path)

  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.format("xml").schema(schema)
      .option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .load(path)

  /** ORC — the other self-describing columnar format a warehouse hands
    * over; schema travels in the file like parquet's footer, so the
    * explicit-schema contract is satisfied by the format itself. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
