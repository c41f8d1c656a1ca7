package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.catalyst.TableIdentifier
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized extract→replay round trips (SURVEY §5.2 #5): tables with
  * generated schemas and partition values must survive
  * extraction + replay with identical catalog metadata. A fixed seed
  * keeps the fixture set reproducible; five cases bound the runtime
  * (each is a full metastore DDL cycle).
  */
class RoundTripRandomSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private val colType: Gen[String] = Gen.oneOf(
    "INT", "BIGINT", "STRING", "DOUBLE", "DATE", "TIMESTAMP",
    "DECIMAL(10,2)", "ARRAY<STRING>", "MAP<STRING,INT>",
    "STRUCT<a: INT, b: STRING>")

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  private case class Tbl(name: String, cols: Seq[(String, String)],
                         partCols: Seq[String], partValues: Seq[Seq[String]])

  private val tblGen: Gen[Tbl] = for {
    name <- ident
    nCols <- Gen.choose(1, 5)
    colNames <- Gen.listOfN(nCols + 2, ident).map(_.distinct).suchThat(_.size >= 3)
    types <- Gen.listOfN(colNames.size, colType)
    nPart <- Gen.choose(0, 2)
    nVals <- Gen.choose(1, 3)
    vals <- Gen.listOfN(nVals,
      Gen.listOfN(nPart, Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)))
  } yield {
    val (pcols, dcols) = colNames.splitAt(nPart)
    Tbl(name, dcols.zip(types.drop(nPart)), pcols, if (nPart == 0) Nil else vals)
  }

  private def sample(n: Int): Seq[Tbl] = {
    // deterministic sampling from a fixed seed
    val params = Gen.Parameters.default
    Iterator.iterate(rng.Seed(42L))(_.next)
      .map(s => tblGen.apply(params, s))
      .collect { case Some(t) => t }
      .take(n).toSeq
  }

  test("randomized schemas round-trip through extract + replay") {
    val s = spark
    s.sql("CREATE DATABASE IF NOT EXISTS rnd_src")
    s.sql("DROP DATABASE IF EXISTS rnd_dst CASCADE")
    val tables = sample(5)
    tables.zipWithIndex.foreach { case (t, i) =>
      val tname = s"t${i}_${t.name}"
      val colsSql = (t.cols.map { case (c, ty) => s"$c $ty" } ++
        t.partCols.map(c => s"$c STRING")).mkString(", ")
      val partSql =
        if (t.partCols.isEmpty) ""
        else s"PARTITIONED BY (${t.partCols.mkString(", ")})"
      s.sql(s"CREATE TABLE rnd_src.$tname ($colsSql) USING parquet $partSql")
      t.partValues.distinct.foreach { vs =>
        val spec = t.partCols.zip(vs).map { case (c, v) => s"$c='$v'" }.mkString(", ")
        s.sql(s"ALTER TABLE rnd_src.$tname ADD IF NOT EXISTS PARTITION ($spec)")
      }
    }

    val script = DdlExtract.extract(s, "rnd_src", "*",
      ExtractConfig(useAddSql = true, useContext = true)).script
    ScriptReplay.replay(s, script.replace("rnd_src", "rnd_dst"))

    tables.zipWithIndex.foreach { case (t, i) =>
      val tname = s"t${i}_${t.name}"
      val orig = s.sessionState.catalog.getTableMetadata(
        TableIdentifier(tname, Some("rnd_src")))
      val replayed = s.sessionState.catalog.getTableMetadata(
        TableIdentifier(tname, Some("rnd_dst")))
      assert(replayed.schema == orig.schema, s"schema mismatch for $tname")
      assert(replayed.partitionColumnNames == orig.partitionColumnNames)
      if (orig.partitionColumnNames.nonEmpty) {
        def specs(db: String) = s.sessionState.catalog
          .listPartitions(TableIdentifier(tname, Some(db)))
          .map(_.spec).sortBy(_.toString)
        assert(specs("rnd_dst") == specs("rnd_src"), s"partitions mismatch for $tname")
      }
    }
  }
}
