package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction and token-id encoding —
  * the tokenizer-adjacent stage that turns text into the integer
  * sequences a training pipeline actually ships.
  *
  * `build` ranks distinct tokens by (frequency desc, token asc); the
  * deterministic tie-break makes ids reproducible across runs and
  * engines. The ranking window is a single partition over the
  * VOCABULARY (distinct tokens, which a natural-language corpus keeps
  * in the millions regardless of corpus size — Heaps' law), not over
  * the corpus; the corpus-sized work (token counting) is a partial-
  * aggregated group-by. `encode` is a broadcast join of that small
  * vocab onto the exploded token stream — map-side at any corpus
  * scale.
  */
object Vocab {

  /** (token, freq, token_id) ranked 1..|V|. */
  def build(df: DataFrame, textCol: String, sep: String = " "): DataFrame =
    df.select(explode(split(col(textCol), sep)).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))))

  /** (idCol, pos, token_id) — one row per token occurrence, positions
    * 0-based within the document. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, sep: String = " "): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "tok")))
      .where(col("tok") =!= "")
      .join(broadcast(vocab.select(col("tok"), col("token_id"))), "tok")
      .select(col(idCol), col("pos"), col("token_id"))

  /** Byte-pair-encoding merge learning (Sennrich, Haddow, Birch,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL'16 — the standard subword tokenizer-training algorithm):
    * learn `numMerges` merges over the frequency-weighted vocabulary.
    * Output: one row per learned merge — (rank, left, right,
    * pair_cnt), rank 1-based in merge order.
    *
    * Scale design — the classic vocabulary trick: the corpus is
    * scanned ONCE (word-count aggregate); every merge round then runs
    * over the distinct-word table (Heaps'-law-small however big the
    * corpus), with each word's symbol string re-derived by `replace`.
    * Per round: one pair-count aggregate + a 1-row argmax collect —
    * the same k-row driver-collect shape as the k-means centroids.
    * Determinism: ties broken by (left, right) lexicographically;
    * merge application is greedy left-to-right, which both Spark's
    * and the oracle's `replace` (leftmost, non-overlapping) implement
    * identically over the space-joined symbol string. Symbols split
    * at UTF-16 code units (ASCII-safe; a byte-level variant would
    * pre-encode to byte tokens).
    */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                sep: String = " "): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df.select(explode(split(col(textCol), sep)).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ", split(col("word"), "")).as("sym"), col("freq"))
      .persist()
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    try {
      var exhausted = false
      for (rank <- 1 to numMerges if !exhausted) {
        val best = vocab
          .select(col("freq"), split(col("sym"), " ").as("s"))
          .where(size(col("s")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(0, size(s)-2), " +
              "i -> struct(element_at(s, i+1) AS l, element_at(s, i+2) AS r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += ((rank, l, r, cnt))
          // greedy leftmost application over the padded symbol string;
          // each round's vocab is re-persisted so round j never replays
          // rounds 1..j-1 (or the corpus scan)
          val next = vocab.withColumn("sym",
              trim(regexp_replace(
                concat(lit(" "), col("sym"), lit(" ")),
                lit(java.util.regex.Pattern.quote(s" $l $r ")),
                lit(java.util.regex.Matcher.quoteReplacement(s" $l$r ")))))
            .persist()
          next.count()
          vocab.unpersist(blocking = false)
          vocab = next
        }
      }
    } finally vocab.unpersist(blocking = false)
    merges.toSeq.toDF("rank", "left", "right", "pair_cnt")
  }
}
