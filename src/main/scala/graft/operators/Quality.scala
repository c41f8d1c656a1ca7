package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ pattern):
  * every constraint contributes one metric expression and a pass
  * predicate over that metric; ALL metrics compute in a SINGLE
  * aggregation pass over the data (one scan, one 1-row partial-agg
  * shuffle, however many constraints), then unpivot to one row per
  * constraint. At 100 TB the scan dominates — bolting another
  * constraint onto the suite is free.
  */
object Quality {

  /** @param name   constraint identifier (output row key)
    * @param metric aggregate Column producing a double metric
    * @param pass   predicate over the computed metric column
    */
  final case class Constraint(name: String, metric: Column, pass: Column => Column)

  /** Fraction of rows where `c` is non-null — completeness. */
  def completeness(c: Column): Column =
    round(count(c) / count(lit(1)).cast("double"), 6)

  /** Distinct-to-total ratio — 1.0 iff `c` is a unique key. */
  def uniqueness(c: Column): Column =
    round(countDistinct(c) / count(lit(1)).cast("double"), 6)

  /** Fraction of rows satisfying `p` — predicate compliance. */
  def compliance(p: Column): Column =
    round(count(when(p, 1)) / count(lit(1)).cast("double"), 6)

  /** One row per constraint: `constraint_name`, `metric`, `passed`,
    * ordered by name.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val aggCols = constraints.flatMap { c =>
      val m = c.metric.as(s"${c.name}__m")
      Seq(m)
    }
    val oneRow = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = constraints.map { c =>
      struct(lit(c.name).as("constraint_name"),
        col(s"${c.name}__m").cast("double").as("metric"),
        c.pass(col(s"${c.name}__m")).as("passed"))
    }
    oneRow
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.constraint_name"), col("r.metric"), col("r.passed"))
      .orderBy(col("constraint_name"))
  }
}
