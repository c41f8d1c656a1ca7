package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the table-reconciliation primitive behind
  * CDC validation, migration sign-off and incremental-load audits:
  * given two versions of a keyed table, classify every key as
  * `added` (new only), `removed` (old only), `changed` (present in
  * both, any compared column differs) or `unchanged`.
  *
  * Shape at scale: one full-outer sort-merge join on the key — each
  * side shuffles once on the key it is already naturally keyed by, so
  * pre-bucketed snapshots (the q83 layout) diff with no shuffle at
  * all. Column comparison is null-safe (`<=>`), computed in-row after
  * the join; nothing is collected and no per-column shuffle happens
  * however many columns are compared.
  */
object Diff {

  /** Per-key classification. Output: keyCols*, status. */
  def snapshotDiff(base: DataFrame, curr: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    // a compared key would be renamed to __b_/__c_ form below and the
    // full-outer join on keyCols would silently fail to resolve
    require(keyCols.intersect(compareCols).isEmpty,
      s"keyCols and compareCols must be disjoint; both contain " +
        keyCols.intersect(compareCols).mkString(", "))
    val b = base.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(1))
    val c = curr.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_c", lit(1))
    // alias the compared columns per side before the join so both
    // versions of each column survive into the classification row
    val bAliased = compareCols.foldLeft(b)((df, cn) => df.withColumnRenamed(cn, s"__b_$cn"))
    val cAliased = compareCols.foldLeft(c)((df, cn) => df.withColumnRenamed(cn, s"__c_$cn"))
    val joined = bAliased.join(cAliased, keyCols, "full_outer")
    val same = compareCols
      .map(cn => col(s"__b_$cn") <=> col(s"__c_$cn"))
      .reduce(_ && _)
    joined.select(keyCols.map(col) :+
      when(col("__in_b").isNull, "added")
        .when(col("__in_c").isNull, "removed")
        .when(same, "unchanged")
        .otherwise("changed").as("status"): _*)
  }
}
