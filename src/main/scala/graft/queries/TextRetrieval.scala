package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the `documents` table — TF-IDF and the BM25
  * family (exhaustive scoring, incremental index, MaxScore pruning,
  * champion lists, query-likelihood) plus rank fusion. Split out of
  * [[Text]] in round 15 (pure file move, no behavior change); shared
  * corpus helpers stay on [[Text]].
  */
object TextRetrieval {
  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Text.docs(spark, sfDir)

  // ---------------------------------------------------------------- q66
  /** Lexical tf·idf retrieval ([[graft.llm.Lexical]]): top-20 docs for
    * a 3-term query with exact rational idf (`(N·1e6) div df` — the
    * documented log-free form; see the operator scaladoc). Posting
    * build is a pushed-down IN filter; df and N broadcast; top-k is a
    * TakeOrdered, not a global sort.
    */
  def q66(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Lexical.search(docs(spark, sfDir), "doc_id", "text",
      Seq("spark", "vector", "customer"), topK = 20)

  val q66Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |hits AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |  WHERE tok IN ('spark', 'vector', 'customer') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dft FROM hits GROUP BY tok),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
      |SELECT h.doc_id,
      |  CAST(SUM(h.tf * ((nd.nd * 1000000) // d.dft)) AS BIGINT) AS score,
      |  CAST(COUNT(*) AS INT) AS n_terms
      |FROM hits h JOIN dfreq d USING (tok) CROSS JOIN nd
      |GROUP BY h.doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q90
  /** BM25 retrieval ([[graft.llm.Lexical.bm25Search]]) for the q66
    * query terms: adds the document-length saturation that plain
    * tf·idf lacks, in the exact-rational (log-free) form — top-20 by
    * score with deterministic doc-id tie-break.
    */
  def q90(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Lexical.bm25Search(docs(spark, sfDir), "doc_id", "text",
      Seq("spark", "vector", "customer"), topK = 20)

  val q90Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS tok FROM documents),
      |hits AS (
      |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |  WHERE tok IN ('spark', 'vector', 'customer') GROUP BY 1, 2, 3),
      |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dft FROM hits GROUP BY tok),
      |corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tt FROM documents)
      |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms,
      |  ROUND(CAST(SUM(CAST(ROUND(
      |    ((2*nd - 2*dft + 1) * 22 * tt * tf)
      |      / CAST((2*dft + 1) * (10*tt*tf + 3*tt + 9*dl*nd) AS DOUBLE), 9)
      |    AS DECIMAL(27,9))) AS DOUBLE), 6) AS score
      |FROM hits JOIN dfreq USING (tok) CROSS JOIN corpus
      |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q137
  /** Exact phrase search ("slow hash batch") via the positional
    * posting list ([[graft.llm.Lexical.phraseMatches]]): each term's
    * postings shift by its phrase offset and chain through left-semi
    * joins — the inverted-index phrase query, not a regex scan. The
    * oracle recomputes matches with a token-position list
    * comprehension, so overlapping-occurrence counting and the 0-based
    * position convention are both pinned.
    */
  def q137(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Lexical
      .phraseMatches(docs(spark, sfDir), "doc_id", "text",
        Seq("slow", "hash", "batch"))
      .orderBy(col("doc_id"))

  val q137Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |m AS (SELECT doc_id,
      |        [i FOR i IN range(1, len(s) - 1)
      |         IF s[i] = 'slow' AND s[i+1] = 'hash' AND s[i+2] = 'batch'] AS ps
      |      FROM t)
      |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_matches,
      |  CAST(ps[1] - 1 AS INT) AS first_pos
      |FROM m WHERE len(ps) > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, K = 60) of the
    * two lexical rankings the engine already produces for the shared
    * query terms — tf·idf (q66) and BM25 (q90):
    * `rrf(d) = Σ_lists 1/(K + rank_d)`. RRF is the standard
    * score-scale-free way to combine retrieval backends (lexical +
    * dense, multiple indexes) without calibrating their scores; docs
    * missing from a list simply contribute nothing.
    *
    * Determinism: each addend is rounded to 9 decimals and summed as
    * DECIMAL (exact, order-independent — the q89 discipline); ranks
    * are integers from the already-deterministic (score, doc_id)
    * orderings. The rank windows are unpartitioned but run over the
    * topK = 20 fused candidates, not the corpus.
    */
  def q158(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("spark", "vector", "customer")
    val d = docs(spark, sfDir)
    def ranked(res: DataFrame): DataFrame = res.select(col("doc_id"),
      row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).as("r"))
    val lists =
      ranked(graft.llm.Lexical.search(d, "doc_id", "text", terms, topK = 20))
        .unionByName(
          ranked(graft.llm.Lexical.bm25Search(d, "doc_id", "text", terms, topK = 20)))
    lists.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_lists"),
        sum(expr(
          "CAST(round(CAST(1.0 AS DOUBLE) / (60 + r), 9) AS DECIMAL(18,9))"))
          .as("rrf_dec"))
      .select(col("doc_id"), col("n_lists"),
        round(col("rrf_dec").cast("double"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val q158Sql: String =
    s"""WITH t1 AS ($q66Sql),
       |t2 AS ($q90Sql),
       |r1 AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM t1),
       |r2 AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM t2),
       |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
       |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lists,
       |  ROUND(CAST(SUM(CAST(ROUND(CAST(1.0 AS DOUBLE) / (60 + r), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS rrf
       |FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q159
  /** INCREMENTAL inverted-index maintenance for BM25 through the
    * [[graft.llm.Lexical]] store API: history (75% of docs,
    * `doc_id % 4 != 0`) entered the store as two appended batches in
    * previous runs, the store was then COMPACTED between cycles
    * ([[graft.llm.Lexical.compactBm25Store]] — df fragments merged by
    * per-term addition, (N, T) to one row, postings rewritten sorted
    * by term), and the refresh appends ONLY the new batch. Every BM25
    * input is an additive sufficient statistic, so the served top-20
    * equals the full-corpus recompute bit-for-bit, which is exactly
    * what the oracle (q90's full-corpus SQL) checks — across appends
    * AND across the compaction boundary.
    *
    * Scale: at 100 TB the postings store IS the searchable asset; a
    * refresh costs one tokenize pass over the batch plus an appended
    * fragment set, a query reads only its terms' posting rows
    * (predicate pushdown on `tok`, plan-asserted), and compaction
    * bounds fragment accumulation with a write-then-swap rewrite —
    * history text is never rescanned by any of the three.
    */
  def q159(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = Seq("spark", "vector", "customer")
    val d = docs(spark, sfDir)
    val hist = d.where(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = d.where(pmod(col("doc_id"), lit(4)) === 0)
    val store = graft.Tables.scratchDir(spark, "bm25idx", sfDir)
    // fresh store per invocation: appends are not idempotent, so a
    // re-run (bench warm-up, repeated Verify) must not double-index
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    // previous runs' persisted state: history as two appended batches
    graft.llm.Lexical.appendBm25Batch(
      hist.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", store)
    graft.llm.Lexical.appendBm25Batch(
      hist.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", store)
    // maintenance between refresh cycles
    graft.llm.Lexical.compactBm25Store(spark, store)
    // the refresh: tokenize ONLY the new batch, append its fragments
    graft.llm.Lexical.appendBm25Batch(batch, "doc_id", "text", store)
    graft.llm.Lexical.bm25StoreSearch(spark, store, "doc_id", terms, topK = 20)
  }

  // ---------------------------------------------------------------- q188
  /** MaxScore-pruned BM25 ([[graft.llm.Lexical.bm25MaxScorePruned]]):
    * q90's retrieval through the classic dynamic-pruning tier —
    * per-term score upper bounds sieve out documents that cannot
    * reach the seed threshold before the exact decimal aggregation
    * runs. Lossless by the UB+ε argument in the operator scaladoc,
    * which is exactly what sharing q90's exhaustive-scoring oracle
    * hash-checks; pruned ≡ full is also suite-pinned in
    * `LexicalSpec` on corpora where the prune demonstrably fires.
    */
  def q188(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Lexical.bm25MaxScorePruned(docs(spark, sfDir), "doc_id", "text",
      Seq("spark", "vector", "customer"), topK = 20)

  // ---------------------------------------------------------------- q189
  /** Champion-list BM25 serving ([[graft.llm.Lexical.buildChampionLists]]
    * + [[graft.llm.Lexical.championBm25Search]]): q188 moved MaxScore
    * pruning into the query; q189 moves it into the INDEX — per-term
    * top-m postings are materialized as a serving artifact and the
    * search reads champion-list-sized candidates, shipping the result
    * only when the per-term `cub` bounds PROVE no non-candidate can
    * reach the top-k (exhaustive fallback otherwise — every outcome
    * exact, which sharing q90's oracle hash-checks). Both the
    * proven-complete and fallback paths are pinned in `LexicalSpec`.
    */
  def q189(spark: SparkSession, sfDir: String): DataFrame = {
    val store = graft.Tables.scratchDir(spark, "bm25champ", sfDir)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    graft.llm.Lexical.appendBm25Batch(docs(spark, sfDir), "doc_id", "text", store)
    graft.llm.Lexical.buildChampionLists(spark, store, "doc_id", m = 64)
    graft.llm.Lexical.championBm25Search(spark, store, "doc_id",
      Seq("spark", "vector", "customer"), topK = 20)
  }

  // ---------------------------------------------------------------- q218
  /** Dirichlet-smoothed query-likelihood retrieval
    * ([[graft.llm.Lexical.qldSearch]], μ = 2000, same query terms as
    * q90) — the language-modeling ranking family beside BM25's
    * probabilistic-relevance family: a candidate is scored on every
    * query term, missing terms contributing their background
    * probability, which is what makes partial matches rank sensibly.
    */
  def q218(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Lexical.qldSearch(docs(spark, sfDir), "doc_id", "text",
      Seq("spark", "vector", "customer"), topK = 20)

  val q218Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS tok FROM documents),
      |qt AS (SELECT * FROM toks WHERE tok IN ('spark', 'vector', 'customer')),
      |hits AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |         FROM qt GROUP BY 1, 2, 3),
      |cf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf FROM qt GROUP BY tok),
      |corpus AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tt
      |           FROM documents),
      |sp AS (SELECT c.doc_id, c.dl, cf.tok, cf.cf
      |       FROM (SELECT DISTINCT doc_id, dl FROM hits) c CROSS JOIN cf),
      |sc AS (SELECT sp.doc_id, sp.dl, sp.tok, sp.cf, COALESCE(h.tf, 0) AS tf
      |       FROM sp LEFT JOIN hits h
      |         ON sp.doc_id = h.doc_id AND sp.tok = h.tok)
      |SELECT doc_id,
      |  CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS INT) AS n_terms,
      |  ROUND(CAST(SUM(CAST(ROUND(ln(
      |    (CAST(tf AS DOUBLE) + 2000.0 * CAST(cf AS DOUBLE) / tt) /
      |    (CAST(dl AS DOUBLE) + 2000.0)), 9) AS DECIMAL(27,9))) AS DOUBLE), 6) AS score
      |FROM sc CROSS JOIN corpus
      |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin


  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q66_tfidf_search", q66 _, Some(q66Sql)),
    ("q90_bm25_search", q90 _, Some(q90Sql)),
    ("q137_phrase_search", q137 _, Some(q137Sql)),
    ("q158_rrf_fusion", q158 _, Some(q158Sql)),
    // oracle = q90's full-corpus BM25: merged sufficient statistics
    // must reproduce the from-scratch ranking exactly (q122's
    // reuse-the-batch-oracle precedent)
    ("q159_bm25_incremental", q159 _, Some(q90Sql)),
    // oracle = q90's exhaustive BM25: the MaxScore prune must
    // reproduce the full ranking exactly (the q159/q122 precedent of
    // sharing the unpruned oracle)
    ("q188_bm25_maxscore", q188 _, Some(q90Sql)),
    // oracle = q90's exhaustive BM25 again: the champion-list serving
    // path (or its provably-needed fallback) must reproduce the full
    // ranking exactly
    ("q189_bm25_champion_lists", q189 _, Some(q90Sql)),
    ("q218_qld_search", q218 _, Some(q218Sql))
  )
}
