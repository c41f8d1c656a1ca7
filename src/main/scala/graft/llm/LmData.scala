package graft.llm

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model training-example assembly: the last transform
  * between a cleaned corpus and an LM training shard.
  *
  * [[examples]] emits fixed-context next-token prediction rows
  * (Bengio et al.'s neural-LM dataset shape) with `negatives`
  * NCE/negative-sampling draws per example (Mikolov et al.,
  * arXiv:1310.4546 §2.2) — one row per (example, candidate word)
  * with `label` 1 for the true next token and 0 for each negative.
  * Negative draws are DETERMINISTIC: the j-th negative for an example
  * is the vocab word whose frequency rank is
  * `poly_hash(context # target # j) mod |V|` — reproducible across
  * runs, engines and partitionings (the oracle re-derives every
  * draw), trading Mikolov's unigram^(3/4) skew for exactness; the
  * rank table IS frequency-sorted, so hash uniformity over ranks is
  * the uniform-over-vocab baseline he compares against.
  *
  * Scale shape: example construction is one in-row pass (windows
  * built with higher-order functions, no self-join); the vocabulary
  * is Heaps'-law-small and broadcast into the negative lookup; the
  * only corpus-sized shuffle is the vocab count itself (partial
  * aggregation on tokens).
  */
object LmData {

  def examples(df: DataFrame, idCol: String, textCol: String,
               context: Int = 4, negatives: Int = 2): DataFrame = {
    require(context >= 1 && negatives >= 0, "need context >= 1, negatives >= 0")
    GraftFunctions.ensureRegistered(df.sparkSession)
    val toks = df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .where(size(col("toks")) > context)
    val exs = toks.select(col(idCol),
        posexplode(transform(
          sequence(lit(context + 1), size(col("toks"))),
          p => struct(
            array_join(slice(col("toks"), p - context, lit(context)), " ")
              .as("context"),
            element_at(col("toks"), p).as("target"))))
          .as(Seq("off", "ex")))
      .select(col(idCol), (col("off") + context + 1).cast("long").as("pos"),
        col("ex.context").as("context"), col("ex.target").as("target"))
    val vocabCounts = df.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val vocab = graft.operators.GlobalRank
      .withGlobalRank(vocabCounts, Seq(col("c").desc, col("w")), "rank")
      .select(col("w"), (col("rank") - 1).cast("long").as("rank"))
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val pos = exs.select(col(idCol), col("pos"), col("context"),
      col("target").as("word"), lit(1).as("label"))
    if (negatives == 0) return pos
    val neg = exs
      .crossJoin(broadcast(vsize))
      .withColumn("j", explode(sequence(lit(1), lit(negatives))))
      .withColumn("h", GraftFunctions.polyHash(
        "concat(context, '#', target, '#', cast(j as string))"))
      .select(col(idCol), col("pos"), col("context"),
        pmod(col("h"), col("v")).as("rank"))
      .join(broadcast(vocab), "rank")
      .select(col(idCol), col("pos"), col("context"),
        col("w").as("word"), lit(0).as("label"))
    pos.unionByName(neg)
  }
}
