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
}
