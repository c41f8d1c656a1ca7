package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of planner operator: physical-plan shape, brute-force
  * equivalence, strictness/null semantics, self-join guard, and the
  * bucketed-input shuffle elision the scaladoc promises.
  */
class AsOfJoinSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("+- == Final Plan ==")
    if (i >= 0) s.substring(i, math.max(i, s.indexOf("+- == Initial Plan =="))) else s
  }

  test("plans AsOfJoinExec with no window; brute-force equivalence on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    // many keys, duplicate times, keys with no right rows and vice versa
    val lhs = (1 to 300).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong))
    val rhs = (1 to 300).map(i => (5 + rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, (1000 + i).toLong))
    val l = lhs.toDF("k", "t", "lid")
    val r = rhs.toDF("rk", "rt", "rid")
    val joined = AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
    val plan = finalPlan(joined)
    assert(plan.contains("AsOfJoin "), plan)
    assert(!plan.contains("Window"), "the custom exec must not fall back to a window")
    val got = joined.collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)) ->
        (if (row.isNullAt(5)) None else Some(row.getLong(5)))).toMap
    // brute force: last right row strictly before (t, lid) in (rt, rid) order
    val want = lhs.map { case (k, t, lid) =>
      val cand = rhs.filter(x => x._1 == k && (x._2 < t || (x._2 == t && x._3 < lid)))
      (k, t, lid) -> cand.sortBy(x => (x._2, x._3)).lastOption.map(_._3)
    }.toMap
    assert(got == want)
    assert(got.values.exists(_.isEmpty) && got.values.exists(_.nonEmpty),
      "the fixture must exercise both matched and null-padded rows")
  }

  test("equal time is NOT matched (strictly prior) and ties pick the latest right") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 100L), (1L, 9L, 101L), (1L, 9L, 102L))
      .toDF("rk", "rt", "rid")
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .select("rid").collect().map(_.getLong(0))
    // rt=10 equals t=10 with rid 100 > lid 1 → not prior; last of the
    // two rt=9 rows (rid 102) wins
    assert(got.toSeq == Seq(102L))
  }

  test("tolerance null-pads matches staler than the bound") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("k", "t", "lid")
    val r = Seq((1L, 95L, 900L), (1L, 105L, 901L)).toDF("rk", "rt", "rid")
    def run(tol: Option[Long]) =
      AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"), tol)
        .collect().map(row => row.getLong(2) ->
          (if (row.isNullAt(5)) None else Some(row.getLong(5)))).toMap
    // unbounded: both lefts match their latest prior right
    assert(run(None) == Map(1L -> Some(900L), 2L -> Some(901L)))
    // tolerance 50: t=200's prior (rt=105, 95 stale) exceeds the bound
    assert(run(Some(50L)) == Map(1L -> Some(900L), 2L -> None))
    // brute-force sweep over tolerances on the random fixture shape
    val rnd = new scala.util.Random(41)
    val lhs = (1 to 120).map(i => (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong))
    val rhs = (1 to 120).map(i => (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, (1000 + i).toLong))
    val lf = lhs.toDF("k", "t", "lid"); val rf = rhs.toDF("rk", "rt", "rid")
    for (tol <- Seq(0L, 3L, 10L)) {
      val got = AsOf.join(lf, rf, Seq("k"), Seq("rk"),
          Seq("t", "lid"), Seq("rt", "rid"), Some(tol))
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)) ->
          (if (row.isNullAt(5)) None else Some(row.getLong(5)))).toMap
      val want = lhs.map { case (k, t, lid) =>
        val cand = rhs.filter(x => x._1 == k && (x._2 < t || (x._2 == t && x._3 < lid)))
        val last = cand.sortBy(x => (x._2, x._3)).lastOption
        (k, t, lid) -> last.filter(x => t - x._2 <= tol).map(_._3)
      }.toMap
      assert(got == want, s"tolerance=$tol")
    }
  }

  test("self-join without aliasing is rejected, with aliasing it works") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 5L, 1L), (1L, 7L, 2L)).toDF("k", "t", "id")
    intercept[IllegalArgumentException] {
      AsOf.join(d, d, Seq("k"), Seq("k"), Seq("t"), Seq("t"))
    }
    val aliased = d.select(col("k").as("rk"), col("t").as("rt"), col("id").as("rid"))
    val got = AsOf.join(d, aliased, Seq("k"), Seq("rk"), Seq("t", "id"), Seq("rt", "rid"))
      .collect().map(row => row.getLong(2) ->
        (if (row.isNullAt(5)) None else Some(row.getLong(5)))).toMap
    assert(got == Map(1L -> None, 2L -> Some(1L)))
  }

  test("bucketed co-partitioned inputs plan no shuffle exchange") {
    val s = spark
    import s.implicits._
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_]", "_")
    val (lt, rt) = (s"asof_l_$app", s"asof_r_$app")
    try {
      (1 to 100).map(i => (i.toLong % 10, i.toLong, i.toLong)).toDF("k", "t", "lid")
        .write.bucketBy(4, "k").sortBy("k", "t", "lid").saveAsTable(lt)
      (1 to 100).map(i => (i.toLong % 10, i.toLong, (1000 + i).toLong)).toDF("rk", "rt", "rid")
        .write.bucketBy(4, "rk").sortBy("rk", "rt", "rid").saveAsTable(rt)
      val joined = AsOf.join(s.table(lt), s.table(rt),
        Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      val plan = finalPlan(joined)
      assert(plan.contains("AsOfJoin "), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed sides must satisfy the declared distribution with no shuffle:\n$plan")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $lt")
      s.sql(s"DROP TABLE IF EXISTS $rt")
    }
  }
}
