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
}
