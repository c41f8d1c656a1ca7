package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise z-score outlier detection: flag rows whose value lies
  * more than `threshold` sample standard deviations above/below the
  * group mean — the basic anomaly filter of a metrics or
  * data-quality pipeline.
  *
  * Engine-exact by construction: the per-group moment sums (n, Σx,
  * Σx²) are exact decimal aggregations (order-independent), cast to
  * double once, and mean/std/z are computed in one fixed written
  * order — so z is bit-identical across engines and the threshold
  * comparison can be made on the raw double (see q72's corr/covar
  * for the same discipline).
  *
  * Scale shape: one partial-aggregated shuffle over `groupCols`
  * (cardinality-bounded group keys), then the tiny stats table is
  * BROADCAST back onto the fact scan — the fact rows are never
  * shuffled. A window-function formulation would shuffle the entire
  * fact table by group; this does not.
  */
object Outliers {

  /** Returns the input rows with `mean`, `std` (sample), and `z`
    * columns attached; rows in groups with fewer than 2 rows or zero
    * variance are dropped (z undefined).
    */
  def withZScore(df: DataFrame, valueCol: String, groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    val stats = df.groupBy(gcols: _*)
      .agg(
        expr("CAST(COUNT(*) AS DOUBLE)").as("zs_dn"),
        expr(s"CAST(SUM(CAST($valueCol AS DECIMAL(38,4))) AS DOUBLE)").as("zs_dsx"),
        expr(s"CAST(SUM(CAST($valueCol * $valueCol AS DECIMAL(38,4))) AS DOUBLE)").as("zs_dsxx"))
      .where(col("zs_dn") >= 2.0)
    df.join(broadcast(stats), groupCols)
      .withColumn("mean", expr("zs_dsx / zs_dn"))
      .withColumn("std",
        expr("sqrt((zs_dn * zs_dsxx - zs_dsx * zs_dsx) / (zs_dn * (zs_dn - 1.0)))"))
      .where(col("std") > 0.0)
      .withColumn("z", (col(valueCol) - col("mean")) / col("std"))
      .drop("zs_dn", "zs_dsx", "zs_dsxx")
  }

  /** Rows whose |z| exceeds `threshold`. */
  def flag(df: DataFrame, valueCol: String, groupCols: Seq[String],
           threshold: Double): DataFrame =
    withZScore(df, valueCol, groupCols).where(abs(col("z")) > threshold)
}
