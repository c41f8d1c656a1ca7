package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import PartitionRestore._

/** Decision-table and formatting semantics pinned to the reference
  * (`ExtractHiveDDL.java:199-276`, `README.md:30-49`). */
class PartitionRestoreSpec extends AnyFunSuite {

  private val ctx = ExtractConfig(useAddSql = false, useContext = true)
  private val qual = ExtractConfig(useAddSql = false, useContext = false)

  // --- the four README cases -------------------------------------------
  test("default config → MSCK") {
    assert(decide(hasDefaultPartition = false, hasNonLowercase = false,
      useAddSqlDefault = false, "t") == UseMsck)
  }
  test("USE_ADD_SQL=true → ADD PARTITION") {
    assert(decide(hasDefaultPartition = false, hasNonLowercase = false,
      useAddSqlDefault = true, "t") == UseAddPartitionSql)
  }
  test("__HIVE_DEFAULT_PARTITION__ forces MSCK even when USE_ADD_SQL=true") {
    assert(decide(hasDefaultPartition = true, hasNonLowercase = false,
      useAddSqlDefault = true, "t") == UseMsck)
  }
  test("non-lowercase location forces ADD PARTITION even when USE_ADD_SQL=false") {
    assert(decide(hasDefaultPartition = false, hasNonLowercase = true,
      useAddSqlDefault = false, "t") == UseAddPartitionSql)
  }
  test("both overrides → exception (ExtractHiveDDL.java:231-232)") {
    val e = intercept[PartitionConflictException] {
      decide(hasDefaultPartition = true, hasNonLowercase = true,
        useAddSqlDefault = false, "conflict_part")
    }
    assert(e.getMessage.contains("conflict_part"))
    assert(e.getMessage.contains("default partition"))
  }

  // --- spec formatting --------------------------------------------------
  test("multi-column spec (ExtractHiveDDL.java:263-265 shape)") {
    assert(specSql(Seq("year" -> "2024", "month" -> "01")) ==
      "(year='2024',month='01')")
  }
  test("single-column spec") {
    assert(specSql(Seq("k" -> "v")) == "(k='v')")
  }
  test("value quote escaping (deviation: reference would emit broken SQL)") {
    assert(specSql(Seq("k" -> "o'brien")) == "(k='o\\'brien')")
  }
  test("reference string-surgery compat on partition names") {
    assert(specSqlFromPartitionName("year=2024/month=01") == "year='2024',month='01'")
    assert(specSqlFromPartitionName("k=v") == "k='v'")
  }

  // --- statement formatting --------------------------------------------
  test("MSCK context vs qualified (ExtractHiveDDL.java:247-252)") {
    assert(msckSql("db1", "t1", ctx) == "MSCK REPAIR TABLE t1;")
    assert(msckSql("db1", "t1", qual) == "MSCK REPAIR TABLE db1.t1;")
  }
  test("ADD PARTITION context mode: relative quoted location") {
    val sql = addPartitionSql("db1", "t1", "file:/wh/db1.db/t1/",
      Seq("year" -> "2024", "month" -> "01"),
      "file:/wh/db1.db/t1/year=2024/month=01", ctx)
    assert(sql ==
      "ALTER TABLE t1 ADD PARTITION (year='2024',month='01') LOCATION \"year=2024/month=01\";")
  }
  test("ADD PARTITION qualified mode: absolute quoted location") {
    val sql = addPartitionSql("db1", "t1", "file:/wh/db1.db/t1/",
      Seq("year" -> "2024"), "file:/wh/db1.db/t1/year=2024", qual)
    assert(sql ==
      "ALTER TABLE db1.t1 ADD PARTITION (year='2024') LOCATION \"file:/wh/db1.db/t1/year=2024\";")
  }
}
