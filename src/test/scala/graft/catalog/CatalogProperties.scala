package graft.catalog

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the pure catalog functions
  * (SURVEY §5.2: randomized schemas/partition values).
  */
object CatalogProperties extends Properties("catalog") {

  private val ident: Gen[String] =
    for {
      head <- Gen.alphaLowerChar
      tail <- Gen.listOfN(7, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
    } yield (head :: tail).mkString

  private val partValue: Gen[String] =
    Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.const('-'))).map(_.mkString)

  property("fixCreateTable is idempotent") =
    forAll(ident, ident) { (db, tbl) =>
      val line = s"CREATE TABLE `$db.$tbl`("
      val once = DdlExtractor.fixCreateTable(line)
      DdlExtractor.fixCreateTable(once) == once
    }

  property("fixCreateTable qualifies exactly the first dot") =
    forAll(ident, ident) { (db, tbl) =>
      DdlExtractor.fixCreateTable(s"CREATE TABLE `$db.$tbl`(") ==
        s"CREATE TABLE `$db`.`$tbl`("
    }

  property("specSql matches the reference name-surgery on benign values") =
    forAll(Gen.nonEmptyListOf(Gen.zip(ident, partValue)).map(_.take(4))) { spec =>
      // the reference transforms the metastore name string k1=v1/k2=v2
      val name = spec.map { case (k, v) => s"$k=$v" }.mkString("/")
      PartitionRestore.specSql(spec) ==
        "(" + PartitionRestore.specSqlFromPartitionName(name) + ")"
    }

  property("decision table: overrides beat the default, conflict throws") =
    forAll(Gen.oneOf(true, false), Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (hasDefault, hasUpper, useAddSql) =>
        if (hasDefault && hasUpper)
          Prop(scala.util.Try(
            PartitionRestore.decide(hasDefault, hasUpper, useAddSql, "t")).isFailure)
        else {
          val got = PartitionRestore.decide(hasDefault, hasUpper, useAddSql, "t")
          val want =
            if (hasDefault) PartitionRestore.UseMsck
            else if (hasUpper) PartitionRestore.UseAddPartitionSql
            else if (useAddSql) PartitionRestore.UseAddPartitionSql
            else PartitionRestore.UseMsck
          Prop(got == want)
        }
    }

  property("assemble terminates every statement with ;") =
    forAll(Gen.nonEmptyListOf(ident).map(_.take(5))) { lines =>
      DdlExtractor.assemble(lines).endsWith(";")
    }

  property("replay statement split is inverse of script assembly") =
    forAll(Gen.nonEmptyListOf(ident).map(_.take(4))) { tables =>
      val sections = tables.map(t =>
        ScriptWriter.tableSection("db", t, s"CREATE TABLE $t (a INT);", Nil))
      val script = ScriptWriter.databaseScript("db", ExtractConfig(), sections)
      val stmts = ScriptReplay.statements(script)
      stmts.size == tables.size + 2 && // CREATE DATABASE + USE + one per table
        tables.forall(t => stmts.exists(_.contains(s"CREATE TABLE $t")))
    }
}
