package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The AQE half of the skew story (q45 pins the salting half): with
  * skew-join enabled and thresholds scaled to the fixture, a
  * sort-merge join against a hot key must be re-planned at runtime
  * into split skewed partitions (`skew=true` in the final plan) —
  * the conf recipe a 100 TB deployment runs instead of hand-salting
  * when the skew is not known in advance.
  */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("AQE splits a skewed sort-merge join at runtime") {
    val s = spark
    import s.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the skew detector to the fixture: a partition is skewed
      // if > 1x the median and > 8KB; split to ~8KB chunks
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one hot key carrying 50k rows vs 100 cold keys with 10 each
      val fact = ((1 to 50000).map(i => (0L, i.toLong)) ++
          (1 to 1000).map(i => (1L + i % 100, i.toLong)))
        .toDF("k", "v")
      val dim = (0L to 100L).map(k => (k, s"name_$k")).toDF("k", "name")
      // the bare join must top its stage: with a required distribution
      // above it (e.g. a groupBy), OptimizeSkewedJoin declines to split
      // rather than introduce an extra shuffle
      val joined = fact.join(dim, "k").select(col("name"), col("v"))
      assert(joined.collect().length == 51000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"the hot-key side must be re-planned as a skew join:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
