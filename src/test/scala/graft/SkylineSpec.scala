package graft

import graft.queries.Skyline
import org.scalatest.funsuite.AnyFunSuite

/** The generic Pareto operator on hand-computed cases and dimension
  * configurations the pinned q48 doesn't use.
  */
class SkylineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("hand-computed 2D frontier, ties kept") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1.0, 10), // frontier (cheapest)
      (2L, 2.0, 20), // frontier (bigger)
      (3L, 2.0, 20), // tie of 2 — neither dominates → kept
      (4L, 3.0, 15), // dominated by 2 (pricier, smaller)
      (5L, 2.0, 5)   // dominated by 1 and 2
    ).toDF("id", "price", "size")
    val sky = Skyline.pareto(df, minimize = Seq("price"), maximize = Seq("size"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sky == Set(1L, 2L, 3L))
  }

  test("single maximize dimension degenerates to the max set") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0)).toDF("id", "v")
    val sky = Skyline.pareto(df, minimize = Nil, maximize = Seq("v"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(sky == Set(2L, 3L))
  }

  test("three dimensions over real data: frontier is non-dominated") {
    val parts = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select("p_partkey", "p_retailprice", "p_size")
    val sky = Skyline.pareto(parts,
      minimize = Seq("p_retailprice", "p_partkey"), maximize = Seq("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val all = parts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)): Boolean =
      a._2 <= b._2 && a._1 <= b._1 && a._3 >= b._3 &&
        (a._2 < b._2 || a._1 < b._1 || a._3 > b._3)
    assert(sky.nonEmpty)
    sky.foreach(p => assert(!all.exists(q => dominates(q, p)), s"$p is dominated"))
  }
}
