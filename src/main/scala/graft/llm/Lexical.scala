package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical (tf·idf-family) relevance scoring — the retrieval side of
  * a training-data pipeline (query-driven corpus slicing, contrast
  * sets, dedup-by-retrieval). Classic BM25/tf·idf weights use `log`,
  * whose low bits differ across libm implementations; to stay exactly
  * reproducible (and oracle-checkable) the idf here is the RATIONAL
  * form `idf_scaled(t) = (N · 1e6) div df(t)` — same monotonicity in
  * df (the ranking signal), exact integer arithmetic (documented
  * deviation from the log form).
  *
  * Shape at scale: term matching is a pushed-down `IN` filter on the
  * exploded token stream (the posting-list build); document
  * frequencies of the FEW query terms and the corpus size are
  * broadcast single-purpose tiny frames; the final top-k is a
  * TakeOrdered (per-partition heaps, no global sort).
  */
object Lexical {

  /** Top-k docs by Σ_t tf(d,t)·idf_scaled(t) over literal query
    * terms. Output: (idCol, score bigint, n_terms int), ranked by
    * (score desc, id asc). */
  def search(df: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val hits = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = hits.groupBy(col("tok")).agg(count(lit(1)).as("dft"))
    val nd = df.agg(count(lit(1)).as("nd"))
    hits.join(broadcast(dfreq), "tok").crossJoin(broadcast(nd))
      .groupBy(col(idCol))
      .agg(sum(col("tf") * expr("(nd * 1000000) div dft")).as("score"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
