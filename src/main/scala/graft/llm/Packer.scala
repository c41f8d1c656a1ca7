package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-cut sequence packing — the batching stage that turns a
  * token stream into fixed-capacity training rows: documents are laid
  * end-to-end in a deterministic order and the stream is cut every
  * `capacity` tokens, so a document's batch is
  * `floor(tokens_before_it / capacity)`.
  *
  * Packing is inherently sequential, so the scale unit is the BUCKET:
  * documents are first split into `buckets` independent streams (by id
  * hash), each packed with its own running prefix sum. One shuffle
  * (the per-bucket window); buckets are the parallelism knob — at
  * 100 TB you raise the bucket count, never the per-bucket work. The
  * capacity fill of every batch except a bucket's last is ≥
  * `capacity − max_doc_len + 1` by construction.
  */
object Packer {

  /** Per-document packing assignment:
    * (idCol, bucket int, batch bigint, offset bigint, n_tokens int) —
    * `offset` is the document's first-token position within its batch
    * stream (may exceed capacity only for documents longer than the
    * capacity, which straddle cuts exactly like the training concat
    * does). */
  def pack(df: DataFrame, idCol: String, textCol: String,
           capacity: Int = 2048, buckets: Int = 8): DataFrame =
    packCounts(
      df.select(col(idCol), size(split(col(textCol), " ")).as("__nt")),
      idCol, "__nt", capacity, buckets)

  /** [[pack]] over a precomputed per-document token-count column —
    * the form the tokenize→pack pipeline uses, where the count is the
    * SUBWORD stream length the tokenizer emitted, not the whitespace
    * token count. Same output contract and bucket/window shape. */
  def packCounts(df: DataFrame, idCol: String, nTokensCol: String,
                 capacity: Int = 2048, buckets: Int = 8): DataFrame = {
    require(capacity >= 1 && buckets >= 1, "need capacity, buckets >= 1")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    df.select(col(idCol),
        pmod(col(idCol), lit(buckets)).cast("int").as("bucket"),
        col(nTokensCol).cast("int").as("n_tokens"))
      .withColumn("prev_cum",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(idCol), col("bucket"),
        expr(s"prev_cum div $capacity").as("batch"),
        (col("prev_cum") % capacity).as("offset"), col("n_tokens"))
  }
}
