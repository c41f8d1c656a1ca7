package graft.llm

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the sequence-prep stage
  * that turns variable-length documents into fixed-size training
  * samples (window `w` tokens, stride `s` < w for overlap).
  *
  * Chunk count per doc is `1 + ceil((len − w) / s)` (one chunk for
  * short docs), computed with exact integer arithmetic
  * (`(len − w + s − 1) div s`). Everything is in-row: tokenize once,
  * explode only the per-doc chunk index (≈ len/s rows, the output
  * cardinality itself), slice + fingerprint each window with the
  * portable rolling hash. No shuffle at any corpus size — chunking is
  * embarrassingly parallel and stays that way.
  */
object Chunker {

  /** (idCol, chunk_id int, n_tokens int, chunk_hash bigint) — the
    * hash is `poly_hash` of the space-joined window, an
    * engine-portable fingerprint usable for chunk-level dedup. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            window: Int = 32, stride: Int = 24): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("nch",
        when(size(col("toks")) <= window, lit(1)).otherwise(
          expr(s"(size(toks) - $window + $stride - 1) div $stride") + 1))
      .select(col(idCol), col("toks"),
        explode(expr("sequence(0, cast(nch - 1 as int))")).as("chunk_id"))
      .withColumn("chunk", expr(s"slice(toks, chunk_id * $stride + 1, $window)"))
      .select(col(idCol), col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        expr("poly_hash(concat_ws(' ', chunk))").as("chunk_hash"))
  }
}
