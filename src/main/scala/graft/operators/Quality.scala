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

  /** A declared foreign-key relationship: every non-null `factKey`
    * value in `fact` must exist as `dimKey` in `dim`. */
  final case class FkCheck(name: String, fact: DataFrame, factKey: String,
                           dim: DataFrame, dimKey: String)

  /** Cross-table referential-integrity audit — the multi-table
    * complement of [[check]]: one row per declared FK with the fact
    * row count, null-key count, and orphan count (non-null keys
    * missing from the dimension). Null keys are reported separately,
    * NOT as orphans — a null FK is a completeness problem, a dangling
    * one a consistency problem, and at 100 TB they have different
    * owners.
    *
    * Each check is one key-only left-anti join (fact shuffles its key
    * column, the dimension its distinct key — never whole rows) plus
    * one aggregation pass over the fact; checks are independent and
    * their single-row results union. Output: constraint_name, n_rows,
    * n_null_keys, n_orphans, passed — ordered by name.
    */
  def referentialIntegrity(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one FK check")
    checks.map { c =>
      val orphans = c.fact.where(col(c.factKey).isNotNull)
        .select(col(c.factKey).as("__k"))
        .join(c.dim.select(col(c.dimKey).as("__k")).distinct(),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      c.fact.agg(count(lit(1)).as("n_rows"),
          count(when(col(c.factKey).isNull, 1)).as("n_null_keys"))
        .crossJoin(orphans)
        .select(lit(c.name).as("constraint_name"), col("n_rows"),
          col("n_null_keys"), col("n_orphans"),
          (col("n_orphans") === 0 && col("n_null_keys") === 0).as("passed"))
    }.reduce(_ unionByName _).orderBy(col("constraint_name"))
  }

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
