package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement metrics over a (item, label) observation
  * stream — the label-quality gate a crowd-labeling pipeline runs
  * BEFORE training on aggregated labels (the q151 weighted vote says
  * which label to keep; agreement says whether the labels are worth
  * keeping at all).
  */
object Agreement {

  /** Fleiss' kappa (Fleiss, "Measuring nominal scale agreement among
    * many raters", Psychological Bulletin 1971): chance-corrected
    * agreement for a fixed number of raters per item.
    *
    *   P_o = (Σ_{i,j} n_ij² − N·n) / (N·n·(n−1))
    *   P_e = Σ_j (c_j / (N·n))²
    *   κ   = (P_o − P_e) / (1 − P_e)
    *
    * where n_ij = raters assigning category j to item i, c_j = Σ_i
    * n_ij, N = items, n = raters per item (`nRaters`, validated).
    *
    * Determinism: every input to the three final divisions is an
    * exact integer aggregate (cell counts squared are decimal-summed,
    * so no overflow at any corpus size); the double expressions are
    * evaluated in the same literal order as the oracle SQL, so the
    * IEEE results match bit-for-bit and one `round(…, 6)` per output
    * column is the only rounding.
    *
    * Scale shape: one shuffle keyed on (item, label) builds the cell
    * counts; everything after reduces to a categories-sized and then
    * 1-row frame (the 1-row crossJoin is the allowlisted broadcast
    * shape). No window, no per-item state.
    *
    * Output (single row): n_items, n_cats, po, pe, kappa.
    */
  def fleissKappa(obs: DataFrame, itemCol: String, labelCol: String,
                  nRaters: Int): DataFrame = {
    require(nRaters >= 2, "Fleiss' kappa needs at least 2 raters per item")
    val cells = obs.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("nij"))
    val istats = cells.agg(
      sum(expr("cast(nij * nij as decimal(38,0))")).cast("double").as("sum_sq"),
      sum(col("nij")).cast("double").as("t_obs"))
    val cstats = cells.groupBy(col(labelCol))
      .agg(sum(col("nij")).as("cj"))
      .agg(sum(expr("cast(cj as decimal(38,0)) * cj")).cast("double").as("sum_cj2"),
        count(lit(1)).as("n_cats"))
    // validate the caller's nRaters against the data IN-PLAN (no extra
    // driver action): a single ragged item silently skews n_items and
    // the P_o denominator, so it must fail loudly instead. The check
    // is a 1-row min/max over per-item totals riding the same cells.
    val itot = cells.groupBy(col(itemCol)).agg(sum(col("nij")).as("t"))
      .agg(min(col("t")).cast("long").as("mn_t"),
        max(col("t")).cast("long").as("mx_t"))
    istats.crossJoin(cstats).crossJoin(itot)
      .withColumn("po",
        when(col("mn_t").isNull, lit(null).cast("double")) // zero items: stats row is all-null, not an error
          .when(col("mn_t") === nRaters.toLong && col("mx_t") === nRaters.toLong,
            (col("sum_sq") - col("t_obs")) /
              (col("t_obs") * lit((nRaters - 1).toDouble)))
          .otherwise(raise_error(concat(
            lit(s"fleissKappa: per-item observation counts must all equal " +
              s"nRaters=$nRaters; got range "),
            col("mn_t"), lit(".."), col("mx_t")))))
      .withColumn("pe", col("sum_cj2") / (col("t_obs") * col("t_obs")))
      .select(
        (col("t_obs") / nRaters).cast("long").as("n_items"),
        col("n_cats").cast("int").as("n_cats"),
        round(col("po"), 6).as("po"),
        round(col("pe"), 6).as("pe"),
        // single-category corpus ⇒ pe=1 ⇒ kappa undefined (0/0): NULL,
        // not NaN
        round(when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))), 6).as("kappa"))
  }
}
