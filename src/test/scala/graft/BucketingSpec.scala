package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins (SURVEY §2.2 joins row, the
  * "pre-partitioning / bucketing" scale technique): both fact tables
  * written bucketed on the join key must join with NO shuffle exchange
  * on either side — at 100 TB this is the difference between a
  * one-time layout cost and a per-query full-data shuffle.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    s.sql("CREATE DATABASE IF NOT EXISTS bkt")
    s.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    s.sql("DROP TABLE IF EXISTS bkt.orders_b")
    Tables.load(s, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("bkt.lineitem_b")
    Tables.load(s, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("bkt.orders_b")

    val joined = s.table("bkt.lineitem_b")
      .join(s.table("bkt.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // force the join path (not broadcast) to prove bucket co-location
    val plan = s.sessionState.executePlan(
      joined.queryExecution.logical).executedPlan.toString
    val counted = joined.collect().map(_.getLong(1)).sum
    assert(counted == Tables.load(s, sfDir, "lineitem").count())

    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // only the final groupBy may shuffle; the join itself must not
    assert(shuffles <= 1, s"expected bucket-co-located join, plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    assert(plan.contains("Bucketed: true"), "scan did not use bucketing")
  }
}

/** Dynamic partition pruning: a join against a filtered dim must prune
  * the partitioned fact's scan at runtime — at 100 TB the difference
  * between scanning one partition and all of them.
  */
class DynamicPruningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("join against filtered dim triggers dynamic partition pruning") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    s.sql("CREATE DATABASE IF NOT EXISTS dpp")
    s.sql("DROP TABLE IF EXISTS dpp.orders_part")
    Tables.load(s, sfDir, "orders")
      .withColumn("o_priority_key",
        org.apache.spark.sql.functions.substring(col("o_orderpriority"), 1, 1))
      .write.partitionBy("o_priority_key").mode("overwrite")
      .saveAsTable("dpp.orders_part")
    // tiny on-disk dim (not constant-foldable), filtered to one value
    s.sql("DROP TABLE IF EXISTS dpp.prio_dim")
    import s.implicits._
    Seq(("1", "urgent"), ("3", "medium"), ("5", "low"))
      .toDF("o_priority_key", "label").write.mode("overwrite")
      .saveAsTable("dpp.prio_dim")
    val dim = s.table("dpp.prio_dim").where(col("label") === "urgent")
    val joined = s.table("dpp.orders_part")
      .join(dim, Seq("o_priority_key"))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    val n = joined.collect().head.getLong(1)
    assert(n == Tables.load(s, sfDir, "orders")
      .where("o_orderpriority LIKE '1%'").count())
  }
}

/** The SQL-string interface over registered test tables: every table
  * from [[Tables.registerAll]] is queryable by name via `spark.sql`.
  */
class SqlInterfaceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("registerAll exposes all tables to spark.sql") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val row = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY n DESC LIMIT 1""".stripMargin).head()
    assert(row.getLong(1) > 0)
    assert(spark.sql("SELECT COUNT(*) FROM documents").head().getLong(0) == 500)
    assert(spark.sql("SELECT COUNT(*) FROM embeddings").head().getLong(0) == 500)
    assert(spark.sql(
      "SELECT COUNT(*) FROM events WHERE event_type = 'view'").head().getLong(0) > 0)
  }
}
