package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanApi}

/** Public DataFrame API over [[AsOfJoinPlan]].
  *
  * `AsOf.join(trades, quotes, Seq("sym"), Seq("q_sym"), Seq("ts"),
  * Seq("q_ts"))` matches each left row to the last right row of the
  * same key strictly before it in time order (lexicographic over the
  * time column lists), null-padding when none exists.
  *
  * For a SELF as-of join (both sides views of one source), alias
  * every right-side column (`select(col("user_id").as("r_user"), …)`)
  * — the plan is assembled from the already-analyzed children, so
  * duplicate attribute ids across sides are rejected rather than
  * silently mis-resolved.
  */
object AsOf {

  /** `tolerance` (pandas `merge_asof` tolerance): when set, a match
    * additionally requires `left_time1 - right_time1 <= tolerance`
    * over the LEADING time column (which must be a long); left rows
    * whose last prior right row is staler than the tolerance emit
    * null-padded. Monotone in the sort order, so it is an emit-time
    * check — the merge never rewinds.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: Seq[String], rightTime: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    val dup = lp.output.map(_.exprId).toSet
      .intersect(rp.output.map(_.exprId).toSet)
    require(dup.isEmpty,
      s"as-of join sides share attribute ids $dup — alias the right side " +
        "(see AsOf scaladoc)")
    def attrs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
              names: Seq[String]) = names.map { n =>
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${plan.output.map(_.name).mkString(", ")}]"))
    }
    GraftPlanApi.ofRows(spark,
      AsOfJoinPlan(attrs(lp, leftKeys), attrs(rp, rightKeys),
        attrs(lp, leftTime), attrs(rp, rightTime), lp, rp, tolerance))
  }
}
