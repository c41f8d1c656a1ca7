package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for [[graft.operators.GlobalRank]] beyond the
  * oracle-pinned q104 setting: the contiguous rank and the
  * partition-parallel NTILE must agree exactly with Spark's own
  * single-partition window forms, including every remainder shape.
  */
class GlobalRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("withGlobalRank equals row_number over a global window") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 101, i.toLong)).toDF("key", "id")
    val got = GlobalRank.withGlobalRank(df, Seq(col("key"), col("id")), "r")
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("withPrefixSum matches the single-partition exclusive running sum") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (((i * 37) % 101).toLong * 1000 + i, (i % 13).toLong))
      .toDF("key", "v") // unique keys, as the contract requires
    val got = GlobalRank.withPrefixSum(df, Seq(col("key")), "v", "ps")
      .select("key", "ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("ps",
        coalesce(sum(col("v")).over(Window.orderBy(col("key"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("key", "ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // empty input stays empty with the column present
    val empty = GlobalRank.withPrefixSum(df.limit(0), Seq(col("key")), "v", "ps")
    assert(empty.columns.contains("ps") && empty.count() == 0)
  }

  test("withNtile matches NTILE for every (n, tiles) remainder shape") {
    val s = spark
    import s.implicits._
    // n from 1 to 25 x tiles in {1, 3, 7, 10}: covers n < tiles,
    // n divisible, and every remainder class in between
    for (n <- Seq(1, 2, 3, 6, 7, 10, 11, 19, 24, 25); tiles <- Seq(1, 3, 7, 10)) {
      val df = (1 to n).map(i => ((i * 13) % 7, i.toLong)).toDF("key", "id")
      val got = GlobalRank.withNtile(df, Seq(col("key"), col("id")), tiles, "t")
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.withColumn("t",
          ntile(tiles).over(Window.orderBy(col("key"), col("id"))))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"NTILE mismatch at n=$n tiles=$tiles")
    }
  }
}
