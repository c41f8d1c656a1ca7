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
    * Scale shape: edges are grouped by fact table (plan semantics, so
    * repeated loads of the same table coalesce) and each fact is
    * scanned ONCE — every one of its dimensions' distinct keys is
    * broadcast-left-joined onto that single key-only scan and all of
    * its edges' counters come out of one aggregation pass. The
    * previous per-edge shape scanned each fact twice per edge (an
    * anti-join pass plus a count pass): 14 scans for the 7-edge
    * TPC-H-ish audit vs 5 now, and on a 100 TB lake the nightly gate
    * is exactly as expensive as one pass over each fact. A dimension
    * too big to broadcast degrades to a shuffled join on that edge
    * without changing the single-scan shape. Output: constraint_name,
    * n_rows, n_null_keys, n_orphans, passed — ordered by name.
    */
  def referentialIntegrity(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one FK check")
    val byFact = checks.zipWithIndex
      .groupBy { case (c, _) => c.fact.queryExecution.analyzed.semanticHash() }
    byFact.values.map { group =>
      val fact = group.head._1.fact
      // one key-only scan; each edge contributes a broadcast dim join
      val keys = fact.select(group.map { case (c, i) =>
        col(c.factKey).as(s"__k$i") }: _*)
      val joined = group.foldLeft(keys) { case (df, (c, i)) =>
        df.join(
          broadcast(c.dim.select(col(c.dimKey).as(s"__dk$i")).distinct()),
          col(s"__k$i") === col(s"__dk$i"), "left")
      }
      val aggs = count(lit(1)).as("n_rows") +: group.flatMap { case (_, i) =>
        Seq(count(when(col(s"__k$i").isNull, 1)).as(s"__null$i"),
          count(when(col(s"__k$i").isNotNull && col(s"__dk$i").isNull, 1))
            .as(s"__orph$i"))
      }
      val one = joined.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(group.map { case (c, i) =>
          struct(lit(c.name).as("constraint_name"), col("n_rows"),
            col(s"__null$i").as("n_null_keys"), col(s"__orph$i").as("n_orphans"),
            (col(s"__orph$i") === 0 && col(s"__null$i") === 0).as("passed"))
        }: _*)).as("r"))
        .select(col("r.*"))
    }.reduce(_ unionByName _).orderBy(col("constraint_name"))
  }

  /** Approximate-functional-dependency audit (the g₃ error of
    * Kivinen & Mannila 1995): does `lhs` determine `rhs`? Per `lhs`
    * value, the majority `rhs` is the dependency's repair target and
    * every other row is a violation — g₃ is exactly the minimum
    * fraction of rows to delete for the FD to hold exactly. The
    * value-level sibling of [[referentialIntegrity]]'s key-level
    * audit: RI says the key resolves, this says the attribute is
    * consistent (one source shouldn't span five languages).
    *
    * One partial-agg shuffle on (lhs, rhs), then a window over the
    * (lhs, rhs)-distinct count table — value-pair-sized, not
    * row-sized; majority ties break toward the smaller `rhs`.
    * Output: lhs, n_rows, n_rhs, majority_<rhs>, n_violations,
    * g3 (violation rate, rounded 6).
    */
  def functionalDependency(df: DataFrame, lhs: String, rhs: String): DataFrame = {
    val counts = df.groupBy(col(lhs), col(rhs)).agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rk",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(lhs)).orderBy(col("cnt").desc, col(rhs))))
    ranked.groupBy(col(lhs))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_rhs"),
        max(when(col("rk") === 1, col(rhs))).as(s"majority_$rhs"),
        sum(when(col("rk") =!= 1, col("cnt")).otherwise(0L)).as("n_violations"))
      .withColumn("g3", round(col("n_violations") / col("n_rows"), 6))
  }

  /** One-step k-anonymity generalization audit (Sweeney 2002): group
    * sizes over the quasi-identifier tuple (`qiCoarse` + `qiFine`);
    * groups of at least `k` rows publish as-is, smaller groups
    * suppress `qiFine` (reported as NULL) and re-aggregate at the
    * coarse level — the first rung of the generalization lattice. A
    * generalized bucket can itself still be under k; it is flagged
    * `at_risk` rather than climbing further (one documented step, not
    * a full lattice search).
    *
    * Two partially-aggregated shuffles: one on the full QI tuple, one
    * on the coarse prefix over the (already tiny) risky group list.
    * Output: qiCoarse…, qiFine (null when generalized), n_rows,
    * generalized, at_risk.
    */
  def kAnonymity(df: DataFrame, qiCoarse: Seq[String], qiFine: String,
                 k: Long): DataFrame = {
    require(qiCoarse.nonEmpty, "need at least one coarse quasi-identifier")
    val counts = df.groupBy((qiCoarse :+ qiFine).map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val safe = counts.where(col("n_rows") >= k)
      .withColumn("generalized", lit(false))
      .withColumn("at_risk", lit(false))
    val gen = counts.where(col("n_rows") < k)
      .groupBy(qiCoarse.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"))
      .withColumn(qiFine, lit(null).cast("string"))
      .withColumn("generalized", lit(true))
      .withColumn("at_risk", col("n_rows") < k)
    safe.unionByName(gen)
      .select((qiCoarse :+ qiFine).map(col) ++
        Seq(col("n_rows"), col("generalized"), col("at_risk")): _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    * companion: a quasi-identifier group that is large enough can
    * still leak its sensitive attribute if (nearly) every row agrees
    * on it. Per QI group this reports both classical forms: DISTINCT
    * l-diversity (number of distinct sensitive values ≥ l) and
    * ENTROPY l-diversity (−Σ p·ln p ≥ ln l, which additionally
    * rejects groups where one value dominates). Entropy follows the
    * engine's portable-log discipline (q173/q187/q199): each double
    * term rounded once at scale 9, then exact DECIMAL accumulation so
    * summation order cannot move the hash; the ≥ ln l comparison is
    * made on the scale-6-rounded entropy in both engines.
    *
    * Shape at scale: one partially-aggregated (QI × sensitive) cell
    * shuffle, then a QI-partitioned window for group sizes and one
    * QI-bounded re-aggregation — the kAnonymity two-level shape.
    * Output: qi…, n_rows, n_sensitive, entropy, distinct_ok,
    * entropy_ok.
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: Column,
                 l: Int): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    val qiCols = qi.map(col)
    val cells = df.groupBy(qiCols :+ sensitive.as("__sens"): _*)
      .agg(count(lit(1)).as("cnt"))
    val sized = cells.withColumn("n_rows",
      sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(qiCols: _*)))
    val p = col("cnt").cast("double") / col("n_rows").cast("double")
    // 0.0 − Σ, not −Σ: a pure group sums to IEEE −0.0 under negation,
    // and engines disagree on whether −0.0 survives a ROUND — the
    // subtraction form yields +0.0 everywhere. The ln(l) cutoff is the
    // JVM-computed double, interpolated verbatim into the oracle SQL
    // by the caller so both engines compare against the same constant.
    sized
      .withColumn("term", round(p * log(p), 9))
      .groupBy(qiCols :+ col("n_rows"): _*)
      .agg(count(lit(1)).as("n_sensitive"),
        round(lit(0.0) - sum(col("term")
          .cast(org.apache.spark.sql.types.DecimalType(27, 9))).cast("double"), 6)
          .as("entropy"))
      .withColumn("distinct_ok", col("n_sensitive") >= l)
      .withColumn("entropy_ok", col("entropy") >= lit(math.log(l.toDouble)))
      .select(qiCols ++ Seq(col("n_rows"), col("n_sensitive"), col("entropy"),
        col("distinct_ok"), col("entropy_ok")): _*)
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
