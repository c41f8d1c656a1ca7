package graft.sources

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Lossless-roundtrip contract of the line-format sources under
  * adversarial payloads — quotes, commas, backslashes, multibyte and
  * supplementary-plane text, empty-adjacent content. (Newlines are
  * excluded by contract: JSONL is the documented format for those.)
  */
class TextFormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val nasty = Seq(
    (1L, """plain words"""),
    (2L, """comma, separated, values"""),
    (3L, """has "double quotes" inside"""),
    (4L, """backslash \\ and \" escapes"""),
    (5L, """mixed: "a,b", c\,d, "e"""),
    (6L, """multibyte 世界 héllo"""),
    (7L, """supplementary 😀 plane ！"""),
    (8L, """trailing spaces   """),
    (9L, """   leading spaces"""),
    (10L, """a"""))

  private def roundtrip(fmt: String): Unit = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_fmt_spec_$fmt").toString
    val df = nasty.toDF("id", "text")
    val back = fmt match {
      case "jsonl" =>
        TextFormats.writeJsonl(df, dir)
        TextFormats.readJsonl(s, dir, schema)
      case "csv" =>
        TextFormats.writeCsv(df, dir)
        TextFormats.readCsv(s, dir, schema)
      case "xml" =>
        TextFormats.writeXml(df, dir)
        TextFormats.readXml(s, dir, schema)
    }
    val got = back.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == nasty.sortBy(_._1), s"$fmt roundtrip lost content")
  }

  test("JSONL roundtrip is byte-exact on adversarial strings") { roundtrip("jsonl") }
  test("CSV roundtrip is byte-exact on adversarial strings") { roundtrip("csv") }

  test("XML roundtrip is byte-exact on adversarial strings incl. markup") {
    val s = spark
    import s.implicits._
    // XML-specific hazards on top of the shared set: entity characters
    // and element-like payloads must come back through entity escaping
    val xmlNasty = nasty ++ Seq(
      (11L, """ampersand & and entities &amp; &lt;"""),
      (12L, """angle <brackets> and </closing> tags"""),
      (13L, """a <doc> inside the payload</doc>"""))
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_xml").toString
    TextFormats.writeXml(xmlNasty.toDF("id", "text"), dir)
    val got = TextFormats.readXml(s, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == xmlNasty.sortBy(_._1), "xml roundtrip lost content")
  }

  test("ORC roundtrip is byte-exact on adversarial strings") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_orc").toString
    TextFormats.writeOrc(nasty.toDF("id", "text"), dir)
    val got = TextFormats.readOrc(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == nasty.sortBy(_._1))
  }

  test("explicit schema is honored: longs stay longs, no inference pass") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_types").toString
    TextFormats.writeCsv(Seq((42L, "x")).toDF("id", "text"), dir)
    val back = TextFormats.readCsv(s, dir, schema)
    assert(back.schema("id").dataType == LongType)
    assert(back.schema("text").dataType == StringType)
    assert(back.collect().toSeq == Seq(Row(42L, "x")))
  }
}
