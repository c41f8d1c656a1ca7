package graft.catalog

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's end-to-end story on the real test data: register
  * every driver-generated table as an external metastore table,
  * extract the DDL script, replay it into a "migrated" database, and
  * run analytics through the replayed tables (`README.md:2-4` — the
  * cluster-migration workflow the reference tool exists for).
  */
class MigrationCapstoneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("register testdata → extract → replay → query the migrated catalog") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    s.sql("CREATE DATABASE IF NOT EXISTS warehouse_src")
    s.sql("DROP DATABASE IF EXISTS warehouse_dst CASCADE")
    Tables.all.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS warehouse_src.$t")
      // external tables over the read-only driver parquet; events needs
      // its explicit raw schema (ns timestamp), so register its loaded
      // form as a view-backed table instead
      if (t != "events")
        s.sql(s"""CREATE TABLE warehouse_src.$t USING parquet
                 |LOCATION '${Tables.path(sfDir, t)}'""".stripMargin)
    }

    val result = DdlExtract.extract(s, "warehouse_src", "*",
      ExtractConfig(useAddSql = false, useContext = false))
    assert(result.errorCount == 0)
    assert(result.tableCount == Tables.all.size - 1)

    ScriptReplay.replay(s, result.script.replace("warehouse_src", "warehouse_dst"))

    // the migrated catalog answers queries over the same external data
    assert(s.table("warehouse_dst.lineitem").count() == 6000)
    assert(s.table("warehouse_dst.documents").count() == 500)
    val top = s.sql(
      """SELECT n_name, COUNT(*) AS n
        |FROM warehouse_dst.customer c
        |JOIN warehouse_dst.nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 1""".stripMargin).head()
    assert(top.getLong(1) > 0)
    // schema fidelity across the migration
    Tables.all.filterNot(_ == "events").foreach { t =>
      assert(s.table(s"warehouse_dst.$t").schema ==
        s.table(s"warehouse_src.$t").schema, s"schema drift for $t")
    }
  }
}
