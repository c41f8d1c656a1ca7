package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting API contracts: declared queries with side effects are
  * idempotent, operators keep their structural invariants, and runners
  * restore session state.
  */
class ContractsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("q58 is idempotent: rerunning the fixture build yields identical output") {
    // the query drops and recreates its fixture DB; a leak between
    // runs (stale table, extra partition) would change the script
    val once = queries.CatalogQuery.q58(spark, "unused").collect().toSeq
    val twice = queries.CatalogQuery.q58(spark, "unused").collect().toSeq
    assert(once == twice)
    assert(once.nonEmpty)
  }

  test("ivfAssign: every vector gets exactly nprobe lists and one home") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assign = graft.llm.VectorSearch
      .ivfAssign(embs, "vec_id", "embedding", "label", nprobe = 3)
    val perVec = assign.groupBy("vec_id").count().collect()
    assert(perVec.nonEmpty && perVec.forall(_.getLong(1) == 3L))
    val homes = assign.where(col("rn") === 1).groupBy("vec_id").count().collect()
    assert(homes.forall(_.getLong(1) == 1L))
    assert(homes.length == perVec.length)
  }

  test("streaming runner restores the session's shuffle-partition conf") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val events = graft.streaming.EventStreams.source(spark, "/root/testdata/sf0.001")
    val out = graft.streaming.EventStreams.runToTable(spark,
      graft.streaming.EventStreams.dailyCounts(events), "contracts_daily")
    assert(out.count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    spark.catalog.dropTempView("contracts_daily")
  }

  test("q146 attribution conserves every purchase cent") {
    val sfDir = "/root/testdata/sf0.001"
    val attributed = queries.Events.q146(spark, sfDir)
      .agg(sum(col("attributed_cents"))).collect().head.getLong(0)
    val total = Tables.load(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("bigint")))
      .collect().head.getLong(0)
    // Hamilton largest-remainder split: allocations sum EXACTLY to the
    // purchase total — no rounding drift in either direction
    assert(attributed == total)
  }
}
