package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch source/sink round trips beyond parquet (SURVEY §2.2 scans &
  * sinks rows): CSV and JSON with explicit schemas, and a partitioned
  * parquet write whose partition column survives the round trip.
  */
class SinksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sink-$name").toString

  test("csv round trip with explicit schema and header") {
    val out = tmp("csv")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(df.schema).csv(out)
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ==
      df.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq)
  }

  test("json-lines round trip preserves values and nulls") {
    val out = tmp("json")
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a"), 1.5), (2L, None, -0.5), (3L, Some("c"), 0.0))
      .toDF("id", "name", "v")
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(df.schema).json(out)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet write: partition pruning on read") {
    val out = tmp("part")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("o_status", org.apache.spark.sql.functions.col("o_orderstatus"))
    df.write.mode("overwrite").partitionBy("o_status").parquet(out)
    val back = spark.read.parquet(out).where("o_status = 'F'")
    assert(back.count() == df.where("o_orderstatus = 'F'").count())
    // pruned scan: only the o_status=F directory is listed
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_status"), "partition filter did not reach the scan")
  }

  test("range-sharded writer: bounded, key-sorted, range-disjoint shards") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val out = tmp("shards")
    val df = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    graft.sinks.ShardWriter.writeRangeSharded(df, out, "o_orderkey",
      targetShards = 4, maxRecordsPerFile = 3000)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    // no shard exceeds the record cap
    val perFile = back.groupBy(input_file_name().as("f")).count().collect()
    assert(perFile.forall(_.getLong(1) <= 3000),
      s"oversized shard: ${perFile.map(_.getLong(1)).max}")
    // shards cover disjoint key ranges (global range order)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
    // rows are sorted within each shard (read back one file in order)
    val oneFile = perFile.head.getString(0)
    val keys = spark.read.parquet(oneFile).select("o_orderkey")
      .collect().map(_.getLong(0))
    assert(keys.sameElements(keys.sorted), "shard not internally sorted")
  }
}
