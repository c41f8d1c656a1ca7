package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: token statistics,
  * heuristic language identification, quality scoring, and winnowing
  * fingerprints — the per-document preprocessing stages of a training
  * -data pipeline.
  *
  * Scale design: every operator is embarrassingly per-document (in-row
  * higher-order functions, no explode unless a distinct-count
  * genuinely needs one), aggregated with cardinality-bounded group
  * keys (lang × source). The only shuffles are the final group-bys.
  */
object Text {

  private def docs(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables.load(spark, sfDir, "documents")
  }

  /** BPE-ish regex: letter runs, digit runs, single other non-space —
    * same dialect-neutral pattern in Java regex and RE2.
    */
  private val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  private val stop: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))
  private val langs = stop.keys.toSeq.sorted // de, en, es, fr, zh

  private def scoreSqlDuck(lang: String): String =
    s"len(list_filter(s, t -> list_contains([${stop(lang).map(w => s"'$w'").mkString(",")}], t)))"

  // ---------------------------------------------------------------- q34
  /** Token statistics per (lang, source): whitespace tokens, distinct
    * vocabulary, longest token, BPE-ish regex token count.
    */
  def q34(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats
      .tokenStats(docs(spark, sfDir), "text", BpePattern, Seq("lang", "source"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        round(col("avg_tokens"), 6).as("avg_tokens"), col("max_tok_len"),
        col("n_bpe_tokens"), col("n_vocab"))
      .orderBy(col("lang"), col("source"))

  val q34Sql: String =
    s"""WITH d AS (
       |  SELECT lang, source, doc_id, string_split(text, ' ') AS s, text FROM documents),
       |per_doc AS (
       |  SELECT lang, source, doc_id, len(s)::BIGINT AS n_toks,
       |    list_max(list_transform(s, t -> length(t)))::INT AS max_tok_len,
       |    len(regexp_extract_all(text, '$BpePattern'))::BIGINT AS n_bpe
       |  FROM d),
       |per_group AS (
       |  SELECT lang, source, COUNT(*) AS n_docs,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n_toks) AS BIGINT) / COUNT(*) AS avg_tokens,
       |    MAX(max_tok_len) AS max_tok_len,
       |    CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens
       |  FROM per_doc GROUP BY lang, source),
       |vocab AS (
       |  SELECT lang, source, COUNT(DISTINCT tok) AS n_vocab FROM (
       |    SELECT lang, source, unnest(s) AS tok FROM d)
       |  GROUP BY lang, source)
       |SELECT lang, source, n_docs, n_tokens, ROUND(avg_tokens, 6) AS avg_tokens,
       |  max_tok_len, n_bpe_tokens, n_vocab
       |FROM per_group JOIN vocab USING (lang, source)
       |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Heuristic language-ID (stopword-occurrence argmax, alphabetical
    * tie-break) vs the labeled lang: a confusion matrix.
    */
  def q35(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats
      .withPredictedLanguage(docs(spark, sfDir), "text", stop.toSeq.sortBy(_._1))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))

  val q35Sql: String = {
    val scoreCols = langs.map(l => s"${scoreSqlDuck(l)} AS s_$l").mkString(",\n    ")
    val caseChain = langs.init.map { l =>
      val conds = langs.filterNot(_ == l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n      ")
    s"""WITH scored AS (
       |  SELECT lang,
       |    $scoreCols
       |  FROM (SELECT lang, string_split(text, ' ') AS s FROM documents))
       |SELECT lang,
       |  CASE $caseChain ELSE '${langs.last}' END AS predicted,
       |  COUNT(*) AS n
       |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
  }

  // ---------------------------------------------------------------- q36
  /** Quality scoring: length/stopword/short-token signals combined
    * into a deterministic [0,1] score, bucketed per lang.
    */
  def q36(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats
      .withQualityScore(docs(spark, sfDir), "text",
        stop.values.flatten.toSeq.distinct.sorted)
      .withColumn("bucket",
        when(col("score") >= 0.7, "high")
          .when(col("score") >= 0.45, "medium").otherwise("low"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round((sum(col("score").cast("decimal(38,12)")).cast("double") /
          count(lit(1))), 6).as("avg_score"))
      .orderBy(col("lang"), col("bucket"))

  val q36Sql: String = {
    val allStops = stop.values.flatten.toSeq.distinct.sorted.map(w => s"'$w'").mkString(",")
    s"""WITH d AS (
       |  SELECT lang, doc_id, n_chars, string_split(text, ' ') AS s FROM documents),
       |scored AS (
       |  SELECT lang,
       |    LEAST(1.0, len(s) / 100.0) * 0.5
       |      + (len(list_filter(s, t -> list_contains([$allStops], t))) / CAST(len(s) AS DOUBLE)) * 0.25
       |      + (1.0 - len(list_filter(s, t -> length(t) <= 2)) / CAST(len(s) AS DOUBLE)) * 0.25 AS score
       |  FROM d),
       |bucketed AS (
       |  SELECT lang, score,
       |    CASE WHEN score >= 0.7 THEN 'high'
       |         WHEN score >= 0.45 THEN 'medium' ELSE 'low' END AS bucket
       |  FROM scored)
       |SELECT lang, bucket, COUNT(*) AS n,
       |  ROUND(CAST(SUM(CAST(score AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS avg_score
       |FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q37
  /** Winnowing fingerprints: char 8-gram poly-hashes, window-16 minima,
    * distinct selected hashes, reduced to a bounded row per document
    * with an order-independent checksum.
    *
    * Runs as one native O(L) pass ([[graft.functions.WinnowStats]]:
    * rolling hash + monotonic-deque minima) — the declarative
    * `transform(sequence…, array_min(slice…))` form it replaced is
    * O(L·(k+w)) and was a bench hot spot; the oracle still computes
    * that naive form, pinning the rolling arithmetic to the spec.
    */
  def q37(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats
      .withWinnowStats(docs(spark, sfDir), "text", k = 8, w = 16)
      .select(col("doc_id"), col("ws.n_kgrams").as("n_kgrams"),
        col("ws.n_selected").as("n_selected"), col("ws.checksum").as("checksum"),
        col("ws.min_fp").as("min_fp"), col("ws.max_fp").as("max_fp"))
      .orderBy(col("doc_id"))

  val q37Sql: String = {
    val k = 8; val w = 16
    val ph = graft.functions.PolyHash
    s"""WITH kh AS (
       |  SELECT doc_id,
       |    [list_reduce(list_prepend(0::BIGINT, [unicode(c)::BIGINT for c in string_split(substring(text, i, $k), '')]), (acc, c) -> (acc * ${ph.Base} + c) % ${ph.Mod}) for i in range(1, length(text) - ${k - 2})] AS kh
       |  FROM documents WHERE length(text) >= ${k + w - 1}),
       |sel AS (
       |  SELECT doc_id, len(kh) AS n_kgrams,
       |    list_distinct([list_min(kh[i:i+${w - 1}]) for i in range(1, len(kh) - ${w - 2})]) AS sel
       |  FROM kh)
       |SELECT doc_id, n_kgrams, len(sel) AS n_selected,
       |  list_reduce(list_prepend(0::BIGINT, sel), (acc, v) -> (acc + v) % ${ph.Mod}) AS checksum,
       |  list_min(sel) AS min_fp, list_max(sel) AS max_fp
       |FROM sel ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q52
  /** Reproducible stratified sampling — the training-data subsampling
    * primitive. Membership is `poly_hash(text) mod 100 < rate(lang)`:
    * content-hash-based, so the sample is stable across runs, engines,
    * partitionings and cluster sizes (seeded `sample()` is none of
    * those), and rates are per-stratum (downsample dominant en, keep
    * all zh).
    */
  def q52(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats
      .withSampleBucket(docs(spark, sfDir), "text", buckets = 100)
      .withColumnRenamed("sample_bucket", "bucket")
      .withColumn("rate",
        when(col("lang") === "en", 20)
          .when(col("lang") === "zh", 100)
          .otherwise(50))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("bucket") < col("rate"), 1)).as("n_sampled"),
        min(when(col("bucket") < col("rate"), col("doc_id"))).as("first_kept"))
      .orderBy(col("lang"))

  val q52Sql: String =
    s"""WITH d AS (
       |  SELECT lang, doc_id,
       |    ${graft.functions.PolyHash.duckdbSql("text")} % 100 AS bucket,
       |    CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 100 ELSE 50 END AS rate
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN bucket < rate THEN 1 END) AS n_sampled,
       |  MIN(CASE WHEN bucket < rate THEN doc_id END) AS first_kept
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q59
  /** N-gram repetition quality per language — the Gopher-style
    * machine-text filters ([[graft.llm.TextStats.repetitionStats]]):
    * average top-2-gram share, average duplicate-3-gram share, and
    * the count of documents over the repetition threshold. Per-doc
    * fractions are long/long double divisions rounded to 6 decimals,
    * so the per-language decimal averages are engine-exact.
    */
  def q59(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    graft.llm.TextStats.repetitionStats(d, "doc_id", "text")
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(graft.Num.davg(col("top_gram_frac"), 8), 6).as("avg_top2_frac"),
        round(graft.Num.davg(col("dup_gram_frac"), 8), 6).as("avg_dup3_frac"),
        sum(when(col("top_gram_frac") >= 0.2, 1L).otherwise(0L)).as("n_repetitive"))
      .orderBy(col("lang"))
  }

  val q59Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS s FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |g2 AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS gram
       |       FROM base),
       |c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
       |t2 AS (SELECT doc_id,
       |         ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS topf
       |       FROM c2 GROUP BY doc_id),
       |g3 AS (SELECT doc_id,
       |         unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]) AS gram
       |       FROM base),
       |c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY doc_id, gram),
       |d3 AS (SELECT doc_id,
       |         ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |           / CAST(SUM(c) AS DOUBLE), 6) AS dupf
       |       FROM c3 GROUP BY doc_id),
       |j AS (SELECT base.doc_id, base.lang, topf, dupf
       |      FROM base JOIN t2 USING (doc_id) JOIN d3 USING (doc_id))
       |SELECT lang, COUNT(*) AS n_docs,
       |  ROUND(${graft.Num.davgSql("topf", 8)}, 6) AS avg_top2_frac,
       |  ROUND(${graft.Num.davgSql("dupf", 8)}, 6) AS avg_dup3_frac,
       |  CAST(SUM(CASE WHEN topf >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q63
  /** PII redaction ([[graft.llm.Redact]]): the synthetic tables carry
    * no organic PII, so the query first composes deterministic contact
    * strings from customer keys (phone only on even keys, email only
    * on keys divisible by 3 — the counts must genuinely vary), then
    * runs the ordered ruleset. Everything is in-row regex work; the
    * oracle replays the identical construction and patterns (RE2 ∩
    * Java regex subset, 'g' flag on the DuckDB side).
    */
  def q63(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
    val contact = c.withColumn("contact", concat(
      col("c_name"),
      when(col("c_custkey") % 2 === 0, concat(lit(" ph "),
        lpad((col("c_custkey") % 100).cast("string"), 2, "0"), lit("-"),
        lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("c_nationkey").cast("long") * 173 % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("c_custkey") % 3 === 0, concat(lit(" em "),
        lower(col("c_mktsegment")), lit("."), col("c_custkey").cast("string"),
        lit("@example.com"))).otherwise(lit("")),
      lit(" end")))
    graft.llm.Redact.redact(contact, "contact")
      .select(col("c_custkey"), col("redacted"),
        col("n_phone"), col("n_email"), col("n_num"))
      .orderBy(col("c_custkey"))
  }

  val q63Sql: String =
    """WITH contact AS (
      |  SELECT c_custkey,
      |    c_name ||
      |    CASE WHEN c_custkey % 2 = 0 THEN ' ph ' ||
      |      lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
      |      lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
      |      lpad(CAST(CAST(c_nationkey AS BIGINT) * 173 % 10000 AS VARCHAR), 4, '0')
      |      ELSE '' END ||
      |    CASE WHEN c_custkey % 3 = 0 THEN ' em ' ||
      |      lower(c_mktsegment) || '.' || CAST(c_custkey AS VARCHAR) || '@example.com'
      |      ELSE '' END || ' end' AS s0
      |  FROM customer),
      |r1 AS (
      |  SELECT c_custkey,
      |    CAST(len(regexp_extract_all(s0, '\d{2}-\d{3}-\d{4}')) AS INT) AS n_phone,
      |    regexp_replace(s0, '\d{2}-\d{3}-\d{4}', '[PHONE]', 'g') AS s1
      |  FROM contact),
      |r2 AS (
      |  SELECT c_custkey, n_phone,
      |    CAST(len(regexp_extract_all(s1, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
      |    regexp_replace(s1, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g') AS s2
      |  FROM r1)
      |SELECT c_custkey,
      |  regexp_replace(s2, '\d{4,}', '[NUM]', 'g') AS redacted,
      |  n_phone, n_email,
      |  CAST(len(regexp_extract_all(s2, '\d{4,}')) AS INT) AS n_num
      |FROM r2 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Vocabulary build + token-id encoding ([[graft.llm.Vocab]]): ids
    * rank by (freq desc, token asc) — deterministic across engines —
    * and the encoded corpus is the (doc_id, pos, token_id) stream a
    * training pipeline ships. Corpus-scale work is one partial-
    * aggregated count and one broadcast join; only the |V|-sized
    * ranking runs in a single partition.
    */
  def q65(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val vocab = graft.llm.Vocab.build(d, "text")
    graft.llm.Vocab.encode(d, "doc_id", "text", vocab)
      .orderBy(col("doc_id"), col("pos"))
  }

  val q65Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, s[CAST(i AS INT) + 1] AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
      |  CROSS JOIN range(0, 1024) r(i)
      |  WHERE i < len(s) AND s[CAST(i AS INT) + 1] <> ''),
      |vocab AS (
      |  SELECT tok,
      |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS INT) AS token_id
      |  FROM toks GROUP BY tok)
      |SELECT doc_id, pos, token_id
      |FROM toks JOIN vocab USING (tok)
      |ORDER BY doc_id, pos""".stripMargin

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

  // ---------------------------------------------------------------- q67
  /** Overlapping-window chunking ([[graft.llm.Chunker]]): 32-token
    * windows at stride 24 — the training-sample prep stage. The
    * portable rolling hash fingerprints each window for chunk-level
    * dedup; chunk counts come from exact integer ceil-division.
    */
  def q67(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Chunker.chunk(docs(spark, sfDir), "doc_id", "text",
        window = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_id"))

  val q67Sql: String = {
    val ph = graft.functions.PolyHash
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
       |nch AS (
       |  SELECT doc_id, s,
       |    CASE WHEN len(s) <= 32 THEN 1
       |         ELSE CAST((len(s) - 32 + 23) // 24 AS INT) + 1 END AS nch
       |  FROM base),
       |ch AS (
       |  SELECT doc_id, CAST(k AS INT) AS chunk_id,
       |    s[CAST(k AS INT) * 24 + 1 : CAST(k AS INT) * 24 + 32] AS chunk
       |  FROM nch CROSS JOIN range(0, 1024) r(k) WHERE k < nch)
       |SELECT doc_id, chunk_id, CAST(len(chunk) AS INT) AS n_tokens,
       |  ${ph.duckdbSql("array_to_string(chunk, ' ')")} AS chunk_hash
       |FROM ch ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------------------- q70
  /** Concat-and-cut sequence packing ([[graft.llm.Packer]]): documents
    * laid end-to-end per hash bucket, cut every 256 tokens; output is
    * the per-(bucket, batch) fill summary. Buckets are the
    * parallelism unit — packing is sequential only within a bucket.
    */
  def q70(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Packer.pack(docs(spark, sfDir), "doc_id", "text",
        capacity = 256, buckets = 8)
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("bucket"), col("batch"))

  val q70Sql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS bucket,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, bucket, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_cum
      |  FROM d)
      |SELECT bucket, prev_cum // 256 AS batch, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      |FROM c GROUP BY bucket, batch ORDER BY bucket, batch""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Bigram language-model head: the 50 most frequent adjacent-token
    * pairs with conditional probability P(w2 | w1). cond_p is a
    * double division of the same two BIGINTs in both engines —
    * bit-identical; ties in cnt break on (w1, w2).
    */
  def q74(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats.bigramModel(docs(spark, sfDir), "text")
      .select(col("w1"), col("w2"), col("cnt"), col("ctx_cnt"),
        round(col("cond_p"), 6).as("cond_p"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(50)

  val q74Sql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS s FROM documents),
      |bg AS (SELECT unnest(s[1:len(s)-1]) AS w1, unnest(s[2:len(s)]) AS w2
      |       FROM d WHERE len(s) >= 2),
      |c AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY w1, w2),
      |t AS (SELECT w1, w2, cnt,
      |        CAST(SUM(cnt) OVER (PARTITION BY w1) AS BIGINT) AS ctx_cnt
      |      FROM c)
      |SELECT w1, w2, cnt, ctx_cnt,
      |  ROUND(cnt / CAST(ctx_cnt AS DOUBLE), 6) AS cond_p
      |FROM t ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Heavy hitters without a full-vocabulary shuffle: a mergeable
    * Misra–Gries candidate pass ([[graft.functions.FreqItemsAgg]],
    * capacity 256 ⇒ every token with share > 1/257 guaranteed
    * surviving), then an exact re-count of candidates only, filtered
    * at share > 1/200 — above the guarantee line, so the result is
    * exact and independent of partition/merge order. At 100 TB this
    * shuffles 256 counters per partition + the ~dozens of candidate
    * keys, never the full token key space.
    */
  def q85(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val sketch = toks.agg(
      expr("freq_candidates(tok, 256)").as("cands"),
      count(lit(1)).as("total"))
    val cands = sketch.select(explode(col("cands")).as("tok"))
    toks.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sketch.select(col("total"))))
      .filter(col("n") * 200 > col("total"))
      .select(col("tok"), col("n"),
        round(col("n") / col("total").cast("double"), 6).as("share"))
      .orderBy(col("n").desc, col("tok"))
  }

  val q85Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |ne AS (SELECT tok FROM toks WHERE tok <> ''),
      |t AS (SELECT COUNT(*) AS total FROM ne),
      |c AS (SELECT tok, COUNT(*) AS n FROM ne GROUP BY tok)
      |SELECT tok, n, ROUND(n / CAST(total AS DOUBLE), 6) AS share
      |FROM c, t WHERE n * 200 > total ORDER BY n DESC, tok""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Per-document bigram LM familiarity
    * ([[graft.llm.TextStats.bigramSurprise]]): the 20 documents whose
    * adjacent-token pairs the corpus model finds least probable — the
    * log-free perplexity filter that catches gibberish / boilerplate
    * phrasing a unigram quality score misses. Every smoothed
    * probability is one bigint/bigint double division, so the ranking
    * is engine-exact.
    */
  def q89(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats.bigramSurprise(docs(spark, sfDir), "doc_id", "text")
      .orderBy(col("avg_p"), col("doc_id"))
      .limit(20)

  val q89Sql: String =
    """WITH base AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |p AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
      |      FROM base WHERE len(s) >= 2),
      |pp AS (SELECT doc_id, string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2 FROM p),
      |m AS (SELECT w1, w2, COUNT(*) AS cnt FROM pp GROUP BY 1, 2),
      |cx AS (SELECT w1, SUM(cnt) AS ctx_cnt FROM m GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT w2) AS vs FROM m)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(CAST(SUM(CAST(ROUND((m.cnt + 1) / CAST(cx.ctx_cnt + v.vs AS DOUBLE), 9)
      |    AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*), 6) AS avg_p
      |FROM pp JOIN m USING (w1, w2) JOIN cx USING (w1) CROSS JOIN v
      |GROUP BY doc_id ORDER BY avg_p, doc_id LIMIT 20""".stripMargin

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

  // ---------------------------------------------------------------- q91
  /** Per-(source, lang) quota sampling — the domain-balancing step of
    * a web-scale training mix: keep at most 50 documents per stratum,
    * chosen by content-hash order (stable across runs, engines and
    * partitionings, like q52's buckets), and pin the exact kept set
    * with its doc-id sum. The declared form ranks with one window over
    * each stratum; at 100 TB the same selection runs as a two-pass
    * hash-histogram threshold (find the 50th-smallest hash per
    * stratum, then filter), which needs no per-stratum sort.
    */
  def q91(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("h"), col("doc_id"))
    docs(spark, sfDir)
      .select(col("source"), col("lang"), col("doc_id"),
        GraftFunctions.polyHash("text").as("h"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("rn") <= 50, 1)).as("n_kept"),
        sum(when(col("rn") <= 50, col("doc_id"))).as("sum_kept_ids"))
      .orderBy(col("source"), col("lang"))
  }

  val q91Sql: String =
    s"""WITH d AS (
       |  SELECT source, lang, doc_id,
       |    ${graft.functions.PolyHash.duckdbSql("text")} AS h FROM documents),
       |r AS (SELECT source, lang, doc_id,
       |  row_number() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rn FROM d)
       |SELECT source, lang, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN rn <= 50 THEN 1 END) AS n_kept,
       |  CAST(SUM(CASE WHEN rn <= 50 THEN doc_id END) AS BIGINT) AS sum_kept_ids
       |FROM r GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q97
  /** Chi-square independence cross-tab over (lang × source): observed
    * counts against the independence expectation rᵢ·cⱼ/N, with each
    * cell's χ² contribution in cleared-fraction integer form
    * (o·N − rᵢ·cⱼ)²/(N·rᵢ·cⱼ) — one bigint/bigint double division per
    * cell, engine-exact. The full grid (including never-observed
    * cells, which proper χ² must count) is the cross join of the two
    * marginal tables — cardinality-bounded, never corpus-sized; the
    * corpus is touched once by the counts aggregation.
    */
  def q97(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = docs(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      // grid-bounded (langs × sources); materialized once so the four
      // consumers below share a single corpus scan
      .localCheckpoint()
    val langT = counts.groupBy(col("lang")).agg(sum(col("n")).as("rt"))
    val srcT = counts.groupBy(col("source")).agg(sum(col("n")).as("ct"))
    val tot = counts.agg(sum(col("n")).as("nn"))
    langT.crossJoin(srcT).crossJoin(broadcast(tot))
      .join(counts, Seq("lang", "source"), "left")
      .withColumn("n_obs", coalesce(col("n"), lit(0L)))
      .withColumn("dev", col("n_obs") * col("nn") - col("rt") * col("ct"))
      .select(col("lang"), col("source"), col("n_obs"),
        round((col("rt") * col("ct")).cast("double") / col("nn").cast("double"), 6)
          .as("expected"),
        round((col("dev") * col("dev")).cast("double") /
          (col("nn") * col("rt") * col("ct")).cast("double"), 6).as("contrib"))
      .orderBy(col("lang"), col("source"))
  }

  val q97Sql: String =
    """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      |           FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, SUM(n) AS rt FROM c GROUP BY 1),
      |s AS (SELECT source, SUM(n) AS ct FROM c GROUP BY 1),
      |t AS (SELECT SUM(n) AS nn FROM c),
      |g AS (SELECT lang, source, rt, ct, nn FROM r CROSS JOIN s CROSS JOIN t)
      |SELECT g.lang, g.source, COALESCE(c.n, 0) AS n_obs,
      |  ROUND(CAST(rt * ct AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS expected,
      |  ROUND(CAST((COALESCE(c.n, 0) * nn - rt * ct) * (COALESCE(c.n, 0) * nn - rt * ct)
      |    AS DOUBLE) / CAST(nn * rt * ct AS DOUBLE), 6) AS contrib
      |FROM g LEFT JOIN c ON g.lang = c.lang AND g.source = c.source
      |ORDER BY g.lang, g.source""".stripMargin

  // ---------------------------------------------------------------- q100
  /** Weighted stratum allocation + deterministic selection: apportion
    * a global budget of 100 sample slots across languages
    * proportionally to stratum size by largest-remainder (Hamilton)
    * rounding — exact integer arithmetic, remainder ties broken by
    * lang — then select each stratum's quota by content-hash order
    * (stable across runs/engines/partitionings, as q52/q91). The
    * apportionment runs on the marginal table (5 rows); only the
    * final selection touches per-document rows, with one window per
    * stratum. Output pins the kept set via its doc-id sum.
    */
  def q100(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 100
    val strata = docs(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val tot = strata.agg(sum(col("n_total")).as("nn"))
    val alloc = strata.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($k * n_total) div nn"))
      .withColumn("rem", expr(s"($k * n_total) % nn"))
      .withColumn("extra_rank",
        row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
      .withColumn("n_extra",
        lit(k) - sum(col("base")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("quota",
        (col("base") + when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .as("quota"))
      .select(col("lang"), col("n_total"), col("quota"))
    val ranked = docs(spark, sfDir)
      .select(col("lang"), col("doc_id"), GraftFunctions.polyHash("text").as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
    ranked.join(broadcast(alloc), "lang")
      .groupBy(col("lang"))
      .agg(first(col("n_total")).as("n_total"), first(col("quota")).as("quota"),
        count(when(col("rn") <= col("quota"), 1)).as("n_kept"),
        sum(when(col("rn") <= col("quota"), col("doc_id"))).as("sum_kept_ids"))
      .orderBy(col("lang"))
  }

  val q100Sql: String =
    s"""WITH strata AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total FROM documents GROUP BY 1),
       |tot AS (SELECT SUM(n_total) AS nn FROM strata),
       |alloc AS (
       |  SELECT lang, n_total,
       |    (100 * n_total) // nn AS base, (100 * n_total) % nn AS rem,
       |    ROW_NUMBER() OVER (ORDER BY (100 * n_total) % nn DESC, lang) AS extra_rank,
       |    100 - SUM((100 * n_total) // nn) OVER () AS n_extra
       |  FROM strata CROSS JOIN tot),
       |q AS (SELECT lang, n_total,
       |  CAST(base + CASE WHEN extra_rank <= n_extra THEN 1 ELSE 0 END
       |    AS BIGINT) AS quota FROM alloc),
       |ranked AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY ${graft.functions.PolyHash.duckdbSql("text")}, doc_id) AS rn
       |  FROM documents)
       |SELECT r.lang, q.n_total, q.quota,
       |  COUNT(CASE WHEN r.rn <= q.quota THEN 1 END) AS n_kept,
       |  CAST(SUM(CASE WHEN r.rn <= q.quota THEN r.doc_id END) AS BIGINT) AS sum_kept_ids
       |FROM ranked r JOIN q ON r.lang = q.lang
       |GROUP BY r.lang, q.n_total, q.quota ORDER BY r.lang""".stripMargin

  // ---------------------------------------------------------------- q112
  // Shared CTE builders for the BPE oracles (q112 learn, q120 encode),
  // unrolling merge rounds in q82's fixed-iteration pattern.
  /** Argmax pair of one round, counted over vocab table `w`. */
  private def bpeBestCte(w: String, b: String): String =
    s"""$b AS (
       |  SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p, freq
       |        FROM (SELECT string_split(sym, ' ') AS s, freq FROM $w))
       |  GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin

  /** Token-level greedy leftmost application of `b` onto `w` → `w2`:
    * a left fold over the symbol list that merges (l, r) whenever the
    * accumulated tail token is exactly l and the next symbol is r —
    * identical semantics to the engine's lookaround regex (a merged
    * token l||r can never re-match as l within the round, so no flag
    * is needed). A delimiter-consuming `replace` would merge only
    * alternate occurrences of a run.
    */
  private def bpeMergeCte(w: String, b: String, w2: String): String =
    s"""$w2 AS (
       |  SELECT list_reduce(string_split(sym, ' '),
       |    (acc, x) -> CASE WHEN (acc = b.l OR ends_with(acc, ' ' || b.l)) AND x = b.r
       |      THEN acc || b.r ELSE acc || ' ' || x END) AS sym, freq
       |  FROM $w CROSS JOIN $b b)""".stripMargin

  private val bpeCorpusCte: String =
    s"""w0 AS (
       |  SELECT array_to_string(string_split(word, ''), ' ') AS sym,
       |    CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1)""".stripMargin

  /** The b1..bN round chain after `w0`; `applyLast` also materializes
    * wN (the fully-merged vocabulary the encode oracle reads). */
  private def bpeRoundsCtes(n: Int, applyLast: Boolean = false): String =
    (1 to n).map { i =>
      if (i < n || applyLast)
        s"${bpeBestCte(s"w${i - 1}", s"b$i")},\n${bpeMergeCte(s"w${i - 1}", s"b$i", s"w$i")}"
      else bpeBestCte(s"w${i - 1}", s"b$i")
    }.mkString(",\n")

  /** BPE merge learning ([[graft.llm.Vocab.bpeMerges]]): the first
    * three byte-pair merges over the corpus vocabulary, each round an
    * exact frequency-weighted pair count with lexicographic
    * tie-break. The oracle unrolls the identical three rounds as CTEs
    * (q82's fixed-iteration pattern): list-comprehension pair
    * explosion, argmax by (cnt DESC, l, r), token-level greedy
    * leftmost merge application via a list fold — so pair counts,
    * tie-breaks AND merge application are all hash-checked.
    */
  def q112(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.Vocab.bpeMerges(docs(spark, sfDir), "text", numMerges = 3)
      .orderBy(col("rank"))

  val q112Sql: String =
    s"""WITH $bpeCorpusCte,
       |${bpeRoundsCtes(3)}
       |SELECT CAST(1 AS INT) AS rank, l AS "left", r AS "right", cnt AS pair_cnt FROM b1
       |UNION ALL SELECT 2, l, r, cnt FROM b2
       |UNION ALL SELECT 3, l, r, cnt FROM b3
       |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q114
  /** Line-format roundtrip ([[graft.sources.TextFormats]]): documents
    * written to gzip JSONL and fully-quoted CSV, read back with
    * explicit schemas, and aggregated per lang with a content-hash sum
    * — so row counts, numeric columns AND every text byte must survive
    * both encodings (a lossy quote/escape/charset bug becomes a hash
    * mismatch). The oracle computes the same aggregate straight from
    * parquet: the interchange formats must be invisible to results.
    */
  def q114(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.TextFormats
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val base = graft.Tables.scratchDir(spark, "fmt", sfDir)
    TextFormats.writeJsonl(d, s"$base/jsonl")
    TextFormats.writeCsv(d, s"$base/csv")
    def agg(df: DataFrame, fmt: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(GraftFunctions.polyHash("text")).as("sum_hash"))
        .select(lit(fmt).as("fmt"), col("lang"), col("n_docs"),
          col("sum_chars"), col("sum_hash"))
    agg(TextFormats.readCsv(spark, s"$base/csv", TextFormats.documentsSchema), "csv")
      .unionByName(agg(
        TextFormats.readJsonl(spark, s"$base/jsonl", TextFormats.documentsSchema),
        "jsonl"))
      .orderBy(col("fmt"), col("lang"))
  }

  val q114Sql: String =
    s"""WITH h AS (
       |  SELECT lang, n_chars,
       |    ${graft.functions.PolyHash.duckdbSql("text")} AS ph FROM documents),
       |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(SUM(ph) AS BIGINT) AS sum_hash FROM h GROUP BY 1)
       |SELECT 'csv' AS fmt, lang, n_docs, sum_chars, sum_hash FROM a
       |UNION ALL
       |SELECT 'jsonl', lang, n_docs, sum_chars, sum_hash FROM a
       |ORDER BY fmt, lang""".stripMargin

  // ---------------------------------------------------------------- q168
  /** XML roundtrip ([[graft.sources.TextFormats.writeXml]] /
    * `readXml` — Spark 4's built-in XML source): q114's contract
    * extended to the remaining interchange format a pipeline meets at
    * its edges (feed drops, sitemap-style exports). Documents are
    * written as gzip `<doc>` elements, read back with the explicit
    * schema, and aggregated per lang with the content-hash sum, so
    * entity escaping, whitespace handling and numeric parsing must
    * all be byte-lossless — the oracle computes the same aggregate
    * straight from parquet.
    */
  def q168(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.TextFormats
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val base = graft.Tables.scratchDir(spark, "fmtxml", sfDir)
    TextFormats.writeXml(d, s"$base/xml")
    TextFormats.readXml(spark, s"$base/xml", TextFormats.documentsSchema)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(GraftFunctions.polyHash("text")).as("sum_hash"))
      .select(lit("xml").as("fmt"), col("lang"), col("n_docs"),
        col("sum_chars"), col("sum_hash"))
      .orderBy(col("lang"))
  }

  val q168Sql: String =
    s"""WITH h AS (
       |  SELECT lang, n_chars,
       |    ${graft.functions.PolyHash.duckdbSql("text")} AS ph FROM documents)
       |SELECT 'xml' AS fmt, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(SUM(ph) AS BIGINT) AS sum_hash
       |FROM h GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q120
  /** BPE encode ([[graft.llm.Vocab.bpeEncode]]): tokenize the corpus
    * into subwords with the merges q112 learns (four rounds here) —
    * the encode half of the tokenizer, emitting the (doc_id, pos,
    * subword, subword_id) stream a training pipeline ships. The
    * oracle re-learns the same four merges (unrolled round CTEs),
    * re-applies them to every distinct word with the same greedy
    * fold, and re-derives positions and frequency-ranked ids — so
    * merge application, the word→subword map, cross-word positions
    * AND id assignment are all hash-checked.
    */
  def q120(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val merges = graft.llm.Vocab.bpeMerges(d, "text", numMerges = 4)
    graft.llm.Vocab.bpeEncode(d, "doc_id", "text", merges)
      .orderBy(col("doc_id"), col("pos"))
  }

  val q120Sql: String =
    s"""WITH $bpeCorpusCte,
       |${bpeRoundsCtes(4, applyLast = true)},
       |wordsubs AS (
       |  SELECT replace(sym, ' ', '') AS word, string_split(sym, ' ') AS subs FROM w4),
       |toks AS (
       |  SELECT doc_id, t.wpos AS wpos, t.word AS word FROM (
       |    SELECT doc_id, unnest([{'wpos': i, 'word': s[i]} for i in range(1, len(s) + 1)]) AS t
       |    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
       |  WHERE length(t.word) > 0),
       |subs AS (
       |  SELECT doc_id, wpos, u.spos AS spos, u.subword AS subword FROM (
       |    SELECT doc_id, wpos,
       |      unnest([{'spos': i, 'subword': subs[i]} for i in range(1, len(subs) + 1)]) AS u
       |    FROM toks JOIN wordsubs USING (word))),
       |stream AS (
       |  SELECT doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1 AS INT) AS pos,
       |    subword
       |  FROM subs),
       |ids AS (
       |  SELECT subword,
       |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, subword) AS INT) AS subword_id
       |  FROM stream GROUP BY subword)
       |SELECT doc_id, pos, subword, subword_id
       |FROM stream JOIN ids USING (subword)
       |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------- q127
  /** Temperature-based domain mixture sampling — the
    * mixture-flattening step of a multi-domain training mix (the
    * τ-sampling of Conneau & Lample's XLM, arXiv:1901.07291 §3.1, and
    * the up/down-weighting behind GPT-3-style data mixtures): each
    * source's share of a global token budget is proportional to
    * `tokens^τ` at τ = 1/2, so large domains are down-sampled and
    * small ones up-sampled relative to natural proportions. All
    * arithmetic is exact — the weight is the integer
    * `floor(sqrt(tokens))` (IEEE sqrt of an exactly-representable
    * long is correctly rounded in both engines), the budget is an
    * integer floor division of the weight share, and the selection is
    * the greedy content-hash-ordered prefix whose cumulative tokens
    * fit the budget (stable across runs/engines/partitionings, as
    * q52/q91/q100; the doc that crosses the line is excluded).
    *
    * Scale shape: the stratum table is grid-bounded and broadcast;
    * per-document work is one window per stratum keyed on (hash, id)
    * — q91's shape, with the same documented two-pass
    * histogram-threshold alternative at 100 TB.
    */
  def q127(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budgetTokens = 8000
    val toks = docs(spark, sfDir).select(col("source"), col("doc_id"),
      GraftFunctions.polyHash("text").as("h"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    val budg = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("nt")).as("tokens_total"))
      .withColumn("w",
        floor(sqrt(col("tokens_total").cast("double"))).cast("long"))
      .crossJoin(broadcast(
        toks.groupBy(col("source")).agg(sum(col("nt")).as("t"))
          .agg(sum(floor(sqrt(col("t").cast("double"))).cast("long")).as("sw"))))
      .withColumn("token_budget", expr(s"($budgetTokens * w) div sw"))
    val ranked = toks.withColumn("cum",
      sum(col("nt")).over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
    ranked.join(broadcast(budg), "source")
      .groupBy(col("source"))
      .agg(first(col("n_total")).as("n_total"),
        first(col("tokens_total")).as("tokens_total"),
        first(col("w")).as("weight"),
        first(col("token_budget")).as("token_budget"),
        count(when(col("cum") <= col("token_budget"), 1)).as("n_kept"),
        sum(when(col("cum") <= col("token_budget"), col("nt"))).as("tokens_kept"),
        sum(when(col("cum") <= col("token_budget"), col("doc_id"))).as("sum_kept_ids"))
      .orderBy(col("source"))
  }

  val q127Sql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    ${graft.functions.PolyHash.duckdbSql("text")} AS h,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents),
       |wts AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
       |    CAST(SUM(nt) AS BIGINT) AS tokens_total,
       |    CAST(floor(sqrt(CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE))) AS BIGINT) AS w
       |  FROM d GROUP BY source),
       |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM wts),
       |budg AS (
       |  SELECT source, n_total, tokens_total, w,
       |    (8000 * w) // sw AS token_budget
       |  FROM wts CROSS JOIN tot),
       |ranked AS (
       |  SELECT source, doc_id, nt,
       |    CAST(SUM(nt) OVER (PARTITION BY source ORDER BY h, doc_id)
       |      AS BIGINT) AS cum
       |  FROM d)
       |SELECT r.source, b.n_total, b.tokens_total, b.w AS weight,
       |  CAST(b.token_budget AS BIGINT) AS token_budget,
       |  COUNT(CASE WHEN r.cum <= b.token_budget THEN 1 END) AS n_kept,
       |  CAST(SUM(CASE WHEN r.cum <= b.token_budget THEN r.nt END)
       |    AS BIGINT) AS tokens_kept,
       |  CAST(SUM(CASE WHEN r.cum <= b.token_budget THEN r.doc_id END)
       |    AS BIGINT) AS sum_kept_ids
       |FROM ranked r JOIN budg b USING (source)
       |GROUP BY r.source, b.n_total, b.tokens_total, b.w, b.token_budget
       |ORDER BY r.source""".stripMargin

  // ---------------------------------------------------------------- q128
  /** Tokenize-and-pack: the training-batch producer — the learned BPE
    * tokenizer (q112's merges applied by q120's encode) feeds the
    * concat-and-cut packer (q70's [[graft.llm.Packer]], here
    * [[graft.llm.Packer.packCounts]] over SUBWORD counts rather than
    * whitespace tokens). Output is the per-(bucket, batch) fill
    * summary with a subword-id checksum, so merge learning, encode,
    * id assignment AND batch assembly are hash-checked as one chain —
    * the last mile between a cleaned corpus and a training shard.
    */
  def q128(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val merges = graft.llm.Vocab.bpeMerges(d, "text", numMerges = 4)
    val counts = graft.llm.Vocab.bpeEncode(d, "doc_id", "text", merges)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_subwords"),
        sum(col("subword_id").cast("long")).as("id_sum"))
    graft.llm.Packer
      .packCounts(counts, "doc_id", "n_subwords", capacity = 256, buckets = 8)
      .join(counts, "doc_id")
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_subwords"),
        sum(col("id_sum")).as("sum_subword_ids"))
      .orderBy(col("bucket"), col("batch"))
  }

  val q128Sql: String =
    s"""WITH $bpeCorpusCte,
       |${bpeRoundsCtes(4, applyLast = true)},
       |wordsubs AS (
       |  SELECT replace(sym, ' ', '') AS word, string_split(sym, ' ') AS subs FROM w4),
       |toks AS (
       |  SELECT doc_id, t.wpos AS wpos, t.word AS word FROM (
       |    SELECT doc_id, unnest([{'wpos': i, 'word': s[i]} for i in range(1, len(s) + 1)]) AS t
       |    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
       |  WHERE length(t.word) > 0),
       |subs AS (
       |  SELECT doc_id, wpos, u.spos AS spos, u.subword AS subword FROM (
       |    SELECT doc_id, wpos,
       |      unnest([{'spos': i, 'subword': subs[i]} for i in range(1, len(subs) + 1)]) AS u
       |    FROM toks JOIN wordsubs USING (word))),
       |stream AS (SELECT doc_id, subword FROM subs),
       |ids AS (
       |  SELECT subword,
       |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, subword) AS INT) AS subword_id
       |  FROM stream GROUP BY subword),
       |dc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_subwords,
       |    CAST(SUM(subword_id) AS BIGINT) AS id_sum
       |  FROM stream JOIN ids USING (subword) GROUP BY doc_id),
       |c AS (
       |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS bucket, n_subwords, id_sum,
       |    CAST(COALESCE(SUM(n_subwords) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_cum
       |  FROM dc)
       |SELECT bucket, prev_cum // 256 AS batch, COUNT(*) AS n_docs,
       |  CAST(SUM(n_subwords) AS BIGINT) AS sum_subwords,
       |  CAST(SUM(id_sum) AS BIGINT) AS sum_subword_ids
       |FROM c GROUP BY bucket, batch ORDER BY bucket, batch""".stripMargin

  // ---------------------------------------------------------------- q133
  /** LM training-example assembly ([[graft.llm.LmData.examples]]):
    * 4-token context → next-token prediction rows with 2 deterministic
    * NCE negative draws per example (hash-rank into the
    * frequency-sorted vocabulary). The oracle rebuilds the windows,
    * the vocabulary ranking, and every negative draw — the full
    * (context, word, label) training set is hash-checked.
    */
  def q133(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.LmData.examples(docs(spark, sfDir), "doc_id", "text",
        context = 4, negatives = 2)
      .orderBy(col("doc_id"), col("pos"), col("label").desc, col("word"))

  val q133Sql: String = {
    val ph = graft.functions.PolyHash
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS s FROM documents),
       |exs AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
       |    array_to_string(s[p-4:p-1], ' ') AS context, s[p] AS target
       |  FROM toks, UNNEST(range(5, len(s) + 1)) r(p)),
       |vocab AS (
       |  SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) - 1 AS BIGINT) AS rank
       |  FROM (SELECT w, COUNT(*) AS c
       |        FROM (SELECT unnest(s) AS w FROM toks) GROUP BY w)),
       |vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
       |neg AS (
       |  SELECT e.doc_id, e.pos, e.context, vc.w
       |  FROM exs e CROSS JOIN vsize CROSS JOIN range(1, 3) t(j)
       |  JOIN vocab vc ON vc.rank =
       |    ${ph.duckdbSql("(e.context || '#' || e.target || '#' || CAST(t.j AS VARCHAR))")} % v)
       |SELECT doc_id, pos, context, target AS word, 1 AS label FROM exs
       |UNION ALL
       |SELECT doc_id, pos, context, w AS word, 0 AS label FROM neg
       |ORDER BY doc_id, pos, label DESC, word""".stripMargin
  }

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

  // ---------------------------------------------------------------- q144
  /** Length-weighted deterministic document sample
    * ([[graft.llm.TextStats.weightedSample]], Efraimidis–Spirakis
    * A-ES with the content poly-hash as the draw): 50 docs, odds
    * proportional to `n_chars` — the "sample by token mass, not by
    * document count" selection a mixture builder wants, reproducible
    * bit-for-bit. TakeOrdered shape: per-partition heaps, no global
    * sort.
    */
  def q144(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.llm.TextStats.weightedSample(
      d.withColumn("hv", graft.functions.GraftFunctions.polyHash("text")),
      "doc_id", "n_chars", "hv", k = 50)
  }

  val q144Sql: String =
    s"""WITH h AS (
       |  SELECT doc_id, n_chars, ${graft.functions.PolyHash.duckdbSql("text")} AS hv
       |  FROM documents),
       |p AS (SELECT doc_id, n_chars, CAST(hv AS DOUBLE) / n_chars AS pri FROM h)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pri, doc_id) AS INT) AS rk,
       |  doc_id, n_chars, ROUND(pri, 6) AS pri
       |FROM p ORDER BY pri, doc_id LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q145
  /** k-anonymity audit over the (lang, source) quasi-identifiers
    * ([[graft.operators.Quality.kAnonymity]], k = 5): publishable
    * group sizes, with under-k groups suppressing `source` and
    * re-aggregating per language — the release-gate check a corpus
    * with provenance columns needs before publication, and the
    * privacy-side sibling of the q63 PII redaction pass.
    */
  def q145(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Quality
      .kAnonymity(docs(spark, sfDir), Seq("lang"), "source", k = 5L)
      .orderBy(col("lang"), coalesce(col("source"), lit("")))

  val q145Sql: String =
    """WITH c AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM documents GROUP BY lang, source),
      |safe AS (
      |  SELECT lang, source, n_rows, false AS generalized, false AS at_risk
      |  FROM c WHERE n_rows >= 5),
      |gen AS (
      |  SELECT lang, CAST(NULL AS VARCHAR) AS source,
      |    CAST(SUM(n_rows) AS BIGINT) AS n_rows, true AS generalized,
      |    (CAST(SUM(n_rows) AS BIGINT) < 5) AS at_risk
      |  FROM c WHERE n_rows < 5 GROUP BY lang)
      |SELECT * FROM (SELECT * FROM safe UNION ALL SELECT * FROM gen)
      |ORDER BY lang, COALESCE(source, '')""".stripMargin

  // ---------------------------------------------------------------- q148
  /** Does `source` determine `lang`? The approximate-FD audit
    * ([[graft.operators.Quality.functionalDependency]], g₃ error) over
    * the documents provenance columns: per source, the majority
    * language and the exact fraction of rows breaking the dependency.
    * On a crawl corpus this is the "one feed, one language" sanity
    * check whose violations are exactly the mislabeled-language
    * candidates the q35 classifier should re-score.
    */
  def q148(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Quality
      .functionalDependency(docs(spark, sfDir), "source", "lang")
      .orderBy(col("source"))

  val q148Sql: String =
    """WITH c AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY source, lang),
      |r AS (
      |  SELECT source, lang, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rk
      |  FROM c)
      |SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) AS BIGINT) AS n_rhs,
      |  MAX(CASE WHEN rk = 1 THEN lang END) AS majority_lang,
      |  CAST(SUM(CASE WHEN rk <> 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_violations,
      |  ROUND(SUM(CASE WHEN rk <> 1 THEN cnt ELSE 0 END) / CAST(SUM(cnt) AS DOUBLE), 6) AS g3
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q152
  /** Skip-gram training-pair extraction (word2vec-style data prep):
    * symmetric (center, context) pairs within a ±2 window, the top-50
    * pairs by frequency, and for each a DETERMINISTIC negative sample —
    * the vocabulary word whose frequency rank equals
    * `poly_hash(center ⊔ context) mod |V|` (hash-seeded stand-in for
    * the unigram-table draw, reproducible across engines and runs).
    *
    * Scale design: pair generation is entirely in-row — a higher-order
    * `transform` over the token array emits both directions of each
    * window pair with no self-join (a positions self-join would be
    * per-doc quadratic in window size × length); the only shuffles are
    * the pair-count and vocab-count groupBys. The vocab ranking runs
    * through [[graft.operators.GlobalRank]] — partition-parallel, no
    * single-partition window even at web-corpus vocab sizes — and the
    * rank→negative join broadcasts the vocab.
    */
  def q152(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val toks = d.select(split(col("text"), " ").as("s"))
    val pairs = toks.select(explode(expr(
      """flatten(transform(s, (c, i) ->
        |  flatten(transform(slice(s, i + 2, 2), x ->
        |    array(struct(c AS center, x AS context),
        |          struct(x AS center, c AS context))))))""".stripMargin)).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
    val top = pairs.groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("center"), col("context"))
      .limit(50)
    val vocabCounts = d.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val vocab = graft.operators.GlobalRank
      .withGlobalRank(vocabCounts, Seq(col("freq").desc, col("tok")), "rank")
      .withColumn("rank", (col("rank") - 1).cast("int"))
      .select(col("tok"), col("rank"))
    val vocabSize = vocab.agg(count(lit(1)).as("vs"))
    top.crossJoin(broadcast(vocabSize))
      .withColumn("nrank", expr("poly_hash(center || ' ' || context) % vs"))
      .join(broadcast(vocab), col("nrank") === col("rank"))
      .select(col("center"), col("context"), col("cnt"), col("tok").as("neg"))
      .orderBy(col("cnt").desc, col("center"), col("context"))
  }

  val q152Sql: String = {
    val h = graft.functions.PolyHash.duckdbSql("t.center || ' ' || t.context")
    s"""WITH toks AS (SELECT string_split(text, ' ') AS s FROM documents),
       |b1 AS (SELECT unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
       |       FROM toks WHERE len(s) >= 2),
       |b2 AS (SELECT unnest([s[i] || ' ' || s[i+2] for i in range(1, len(s) - 1)]) AS g
       |       FROM toks WHERE len(s) >= 3),
       |fwd AS (SELECT string_split(g, ' ')[1] AS center, string_split(g, ' ')[2] AS context
       |        FROM (SELECT g FROM b1 UNION ALL SELECT g FROM b2)),
       |sym AS (SELECT center, context FROM fwd
       |        UNION ALL SELECT context AS center, center AS context FROM fwd),
       |top AS (SELECT center, context, COUNT(*) AS cnt FROM sym GROUP BY 1, 2
       |        ORDER BY cnt DESC, center, context LIMIT 50),
       |vocab AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) - 1 AS rank
       |          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |          GROUP BY tok),
       |v AS (SELECT COUNT(*) AS vs FROM vocab)
       |SELECT t.center, t.context, t.cnt, w.tok AS neg
       |FROM top t CROSS JOIN v JOIN vocab w ON w.rank = ($h) % v.vs
       |ORDER BY t.cnt DESC, t.center, t.context""".stripMargin
  }

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

  // ---------------------------------------------------------------- q162
  /** Tokenizer quality per language: fertility (subword tokens per
    * whitespace word) and compression (non-space characters per token)
    * of the corpus-trained BPE (q112's merges applied by q120's
    * encoder) — the standard pair of metrics for judging whether a
    * tokenizer serves every language equally; high-fertility languages
    * pay more sequence length for the same text, which is a real
    * training-cost and context-budget skew at 100 TB.
    *
    * All counts are integers; each output ratio is one exact
    * integer-over-integer division rounded once. Scale rides q120's
    * shape: encoding is per *distinct word* then broadcast back.
    */
  def q162(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val merges = graft.llm.Vocab.bpeMerges(d, "text", numMerges = 4)
    val perDocTok = graft.llm.Vocab.bpeEncode(d, "doc_id", "text", merges)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    d.select(col("doc_id"), col("lang"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"))
      .join(perDocTok, "doc_id")
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens") / col("n_words").cast("double"), 6).as("fertility"),
        round(col("n_chars") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"))
      .orderBy(col("lang"))
  }

  val q162Sql: String =
    s"""WITH $bpeCorpusCte,
       |${bpeRoundsCtes(4, applyLast = true)},
       |wordsubs AS (
       |  SELECT replace(sym, ' ', '') AS word, string_split(sym, ' ') AS subs FROM w4),
       |toks AS (
       |  SELECT doc_id, t.word AS word FROM (
       |    SELECT doc_id, unnest([{'wpos': i, 'word': s[i]} for i in range(1, len(s) + 1)]) AS t
       |    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
       |  WHERE length(t.word) > 0),
       |tok AS (
       |  SELECT doc_id, CAST(SUM(len(subs)) AS BIGINT) AS n_tok
       |  FROM toks JOIN wordsubs USING (word) GROUP BY doc_id),
       |meta AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS BIGINT) AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
       |  FROM documents)
       |SELECT lang, CAST(SUM(n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  ROUND(SUM(n_tok) / CAST(SUM(n_words) AS DOUBLE), 6) AS fertility,
       |  ROUND(SUM(n_chars) / CAST(SUM(n_tok) AS DOUBLE), 6) AS chars_per_token
       |FROM meta JOIN tok USING (doc_id) GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q163
  /** Collocation mining by PMI lift: rank bigrams by
    * P(ab) / (P(a)·P(b)) = c(ab)·N_tok² / (N_big·c(a)·c(b)) — the
    * log-free rational form of pointwise mutual information (the
    * ranking is order-isomorphic to PMI since log is monotone), with a
    * min-count floor of 5 against the low-frequency PMI explosion.
    * This is the phrase-vocabulary induction step (word2vec's phrase
    * pass, tokenizer multi-word entries): q89 scores DOCUMENTS by
    * average bigram probability; this scores BIGRAMS by association.
    *
    * Every factor is an exact integer; the products run in
    * DECIMAL(38,0) (Spark) / HUGEINT (oracle) so c(ab)·N_tok² cannot
    * wrap int64 even at web-corpus token counts (non-ANSI Spark wraps
    * silently where DuckDB raises — exact wide arithmetic keeps the
    * two engines honest with each other); one double division per
    * bigram, rounded once. Shuffles: bigram count, unigram count, two
    * 1-row total broadcasts, TakeOrdered top-20.
    */
  def q163(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val toks = d.select(split(col("text"), " ").as("s"))
    val bigrams = toks.select(explode(expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
          "(a, b) -> struct(a, b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val uni = d.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val nTok = uni.agg(sum(col("cw")).as("n_tok"))
    val big = bigrams.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val nBig = big.agg(sum(col("c_ab")).as("n_big"))
    big.where(col("c_ab") >= 5)
      .join(broadcast(uni.select(col("w").as("a"), col("cw").as("ca"))), "a")
      .join(broadcast(uni.select(col("w").as("b"), col("cw").as("cb"))), "b")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
      .withColumn("lift", round(
        (col("c_ab").cast("decimal(38,0)") * col("n_tok") * col("n_tok"))
          .cast("double") /
          (col("n_big").cast("decimal(38,0)") * col("ca") * col("cb"))
            .cast("double"), 6))
      .select(col("a"), col("b"), col("c_ab"), col("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(20)
  }

  val q163Sql: String =
    """WITH s AS (SELECT string_split(text, ' ') AS s FROM documents),
      |bg AS (
      |  SELECT string_split(g, ' ')[1] AS a, string_split(g, ' ')[2] AS b FROM (
      |    SELECT unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
      |    FROM s WHERE len(s) >= 2)),
      |uni AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
      |ntk AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_tok FROM uni),
      |big AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b),
      |nbg AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_big FROM big)
      |SELECT g.a, g.b, g.c_ab,
      |  ROUND(CAST(CAST(g.c_ab AS HUGEINT) * t.n_tok * t.n_tok AS DOUBLE) /
      |        CAST(CAST(n.n_big AS HUGEINT) * ua.cw * ub.cw AS DOUBLE), 6) AS lift
      |FROM big g
      |JOIN uni ua ON ua.w = g.a JOIN uni ub ON ub.w = g.b
      |CROSS JOIN ntk t CROSS JOIN nbg n
      |WHERE g.c_ab >= 5
      |ORDER BY lift DESC, g.a, g.b LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q172
  /** DSIR importance-weighted data selection (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every document in the raw pool by how much
    * its hashed-bigram distribution looks like a TARGET corpus (here
    * the `lang = 'en'` slice — the paper's target is any trusted
    * sample), then keep the top-scoring documents. The feature space
    * is the paper's hashed n-gram trick: word bigrams hashed into
    * B = 512 buckets, a bag-of-buckets Naive-Bayes model on each
    * side, add-1 smoothing; a document's importance log-weight is
    * Σ_buckets n_b · [ln p̂_target(b) − ln p̂_raw(b)] — exactly the
    * log importance ratio the paper resamples by. Selection here is
    * deterministic top-k with a doc-id tie-break (the paper's Gumbel
    * perturbation is a sampling layer on the same weights).
    *
    * Scale design: the corpus is scanned once into bigram buckets
    * (in-row poly_hash, no shuffle before the bucket aggregates);
    * both distributions are B-row tables — broadcast however big the
    * corpus; the per-document weight is one partial-aggregated
    * group-by over (doc, bucket) joined against the broadcast λ
    * table; top-k is TakeOrdered. Engine parity: all counts are
    * exact integers, one double division + LN per bucket (the q19
    * LN-round-6 precedent, here rounded at 9 then summed in exact
    * DECIMAL so per-doc accumulation is order-independent — q90's
    * idiom). Integer products (t+1)·(R+B) stay below 2⁶³ up to ~3e9
    * corpus bigrams; beyond that widen to decimal as in q163.
    */
  def q172(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 512
    val d = docs(spark, sfDir)
    val bg = d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("s"))
      .where(size(col("s")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
          "(a, b) -> concat(a, ' ', b))")).as("g"))
      .select(col("doc_id"), col("lang"),
        (GraftFunctions.polyHash("g") % B).as("b"))
    val raw = bg.groupBy(col("b")).agg(count(lit(1)).as("r"))
    val tgt = bg.where(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("t"))
    val buckets = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("t"))
    val tot = buckets.agg(sum(col("r")).as("rr"), sum(col("t")).as("tt"))
    val lam = buckets.crossJoin(broadcast(tot))
      .withColumn("lam",
        round(log(((col("t") + 1) * (col("rr") + B)).cast("double") /
          ((col("r") + 1) * (col("tt") + B)).cast("double")), 9)
          .cast("decimal(27,9)"))
      .select(col("b"), col("lam"))
    bg.groupBy(col("doc_id"), col("lang"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(lam), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        // n narrowed to decimal(10,0): a bigint × decimal(27,9)
        // product exceeds Spark's 38-digit cap and silently DROPS
        // scale (per-term ~1e-6 rounding, observed at sf0.01);
        // 10+27+1 = 38 keeps the product exact at scale 9. The scale-9
        // decimal sum is then engine-exact and its double cast
        // deterministic — no second rounding, which would sit a
        // coin-flip from the …5e-7 half-boundary
        sum(col("n").cast("decimal(10,0)") * col("lam"))
          .cast("double").as("logw"))
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(100)
  }

  val q172Sql: String = {
    val ph = graft.functions.PolyHash.duckdbSql("g")
    s"""WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS s FROM documents),
       |bg AS (SELECT doc_id, lang, $ph % 512 AS b FROM (
       |  SELECT doc_id, lang, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
       |  FROM base WHERE len(s) >= 2)),
       |raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r FROM bg GROUP BY b),
       |tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t FROM bg WHERE lang = 'en' GROUP BY b),
       |bk AS (SELECT b, r, COALESCE(t, 0) AS t FROM raw LEFT JOIN tgt USING (b)),
       |tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rr, CAST(SUM(t) AS BIGINT) AS tt FROM bk),
       |lam AS (SELECT b,
       |  CAST(ROUND(LN(CAST((t + 1) * (rr + 512) AS DOUBLE) /
       |               CAST((r + 1) * (tt + 512) AS DOUBLE)), 9) AS DECIMAL(27,9)) AS lam
       |  FROM bk CROSS JOIN tot),
       |db AS (SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2, 3)
       |SELECT doc_id, lang, CAST(COUNT(*) AS INT) AS n_buckets,
       |  CAST(SUM(CAST(n AS DECIMAL(10,0)) * lam) AS DOUBLE) AS logw
       |FROM db JOIN lam USING (b)
       |GROUP BY doc_id, lang ORDER BY logw DESC, doc_id LIMIT 100""".stripMargin
  }

  // --------------------------------------------------------------- q173
  /** Stupid-Backoff bigram language-model scoring (Brants et al.,
    * "Large Language Models in Machine Translation", EMNLP 2007) —
    * the CCNet-style perplexity quality filter: train bigram/unigram
    * counts on the TARGET slice (`lang = 'en'`, standing in for the
    * trusted LM corpus), score every document in the pool by its mean
    * per-transition log score, and surface the WORST-scoring
    * documents — the filter's reject list. Per transition v→w:
    * S = c(vw)/c(v) if the bigram was seen, else 0.4·c(w)/N if the
    * unigram was, else 0.4²/N (two backoff penalties to the uniform
    * floor) — Stupid Backoff's whole point is that these unnormalized
    * rational scores need no discounting pass, which is why it scales
    * to web corpora.
    *
    * Scale design: LM training is two count aggregations over one
    * corpus scan; scoring joins transitions against the count tables
    * BY KEY (v), (w), (v,w) — equi-joins Spark may broadcast at this
    * vocab size but that shuffle-partition cleanly at web scale,
    * unlike a driver-side LM dictionary. N is a 1-row broadcast.
    * Engine parity: counts exact; each transition does the same
    * double division chain in both engines, one LN rounded at 9, then
    * exact DECIMAL accumulation so per-doc summation order is
    * irrelevant (q172's idiom); the final mean divides the exact sum
    * by the transition count in double — no second rounding.
    */
  def q173(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val toks = d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("s"))
    val trans = toks.where(size(col("s")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1), " +
          "(a, b) -> struct(a AS v, b AS w))")).as("p"))
      .select(col("doc_id"), col("lang"), col("p.v"), col("p.w"))
    val uni = toks.where(col("lang") === "en")
      .select(explode(col("s")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val big = trans.where(col("lang") === "en")
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("cb"))
    val tot = uni.agg(sum(col("cw")).as("nn"))
    trans
      .join(big, Seq("v", "w"), "left")
      .join(uni.withColumnRenamed("w", "v").withColumnRenamed("cw", "cv"),
        Seq("v"), "left")
      .join(uni, Seq("w"), "left")
      .na.fill(0L, Seq("cb", "cv", "cw"))
      .crossJoin(broadcast(tot))
      .withColumn("ls", round(log(
        when(col("cb") > 0, col("cb").cast("double") / col("cv").cast("double"))
          .when(col("cw") > 0,
            lit(0.4) * col("cw").cast("double") / col("nn").cast("double"))
          .otherwise(lit(0.4) * lit(0.4) / col("nn").cast("double"))), 9)
        .cast("decimal(27,9)"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("int").as("n_trans"),
        // decimal-exact sum → double, THEN the mean division in
        // double: one deterministic rounding per transition, none at
        // the aggregate (q172's order-independence argument)
        (sum(col("ls")).cast("double") / count(lit(1))).as("avg_logscore"))
      .orderBy(col("avg_logscore").asc, col("doc_id"))
      .limit(100)
  }

  val q173Sql: String =
    """WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS s FROM documents),
      |tr AS (SELECT doc_id, lang,
      |  unnest([{'v': s[i], 'w': s[i+1]} for i in range(1, len(s))], recursive := true)
      |  FROM base WHERE len(s) >= 2),
      |uni AS (SELECT unnest(s) AS w FROM base WHERE lang = 'en'),
      |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM uni GROUP BY w),
      |bc AS (SELECT v, w, CAST(COUNT(*) AS BIGINT) AS cb FROM tr WHERE lang = 'en' GROUP BY v, w),
      |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS nn FROM uc),
      |scored AS (SELECT tr.doc_id, tr.lang,
      |  CAST(ROUND(LN(CASE
      |    WHEN COALESCE(bc.cb, 0) > 0 THEN CAST(bc.cb AS DOUBLE) / CAST(uv.cw AS DOUBLE)
      |    WHEN COALESCE(uw.cw, 0) > 0 THEN 0.4 * CAST(uw.cw AS DOUBLE) / CAST(nn AS DOUBLE)
      |    ELSE 0.4 * 0.4 / CAST(nn AS DOUBLE) END), 9) AS DECIMAL(27,9)) AS ls
      |  FROM tr
      |  LEFT JOIN bc ON tr.v = bc.v AND tr.w = bc.w
      |  LEFT JOIN uc uv ON tr.v = uv.w
      |  LEFT JOIN uc uw ON tr.w = uw.w
      |  CROSS JOIN tot)
      |SELECT doc_id, lang, CAST(COUNT(*) AS INT) AS n_trans,
      |  CAST(SUM(ls) AS DOUBLE) / COUNT(*) AS avg_logscore
      |FROM scored GROUP BY doc_id, lang
      |ORDER BY avg_logscore ASC, doc_id LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q179
  /** Heaps'-law vocabulary-growth curve — the corpus diagnostic that
    * tells a tokenizer/dedup pipeline how vocabulary scales with
    * corpus size (V ∝ Tᵝ, Heaps 1978): the document stream is cut
    * into ten deterministic deciles by id, and each checkpoint
    * reports cumulative token occurrences and cumulative DISTINCT
    * vocabulary — distinctness via each token's first-seen decile
    * (one groupBy(token).min, never a running distinct), so the
    * curve costs two aggregations regardless of corpus size. A
    * flattening curve means new data stops paying vocabulary;
    * a too-steep one flags OCR noise / boilerplate explosion.
    *
    * Scale: the token stream reduces to per-decile occurrence counts
    * and a (token → first decile) table in one shuffle each; the
    * cumulative step is a 10×10 triangle join over decile-sized
    * aggregates (with the 1-row corpus-size broadcast — both
    * allowlisted bounded shapes). All counts integer.
    */
  def q179(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val n = d.agg(max(col("doc_id")).as("mx")).select((col("mx") + 1).as("N"))
    val tok = d.crossJoin(broadcast(n))
      .withColumn("b", expr("CAST((doc_id * 10) div N AS INT)"))
      .select(col("b"), explode(split(col("text"), " ")).as("w"))
    val occ = tok.groupBy(col("b")).agg(count(lit(1)).as("occ"))
    val fst = tok.groupBy(col("w")).agg(min(col("b")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("nd"))
    val ks = occ.select(col("b").as("k")).distinct()
    val cumT = ks.join(broadcast(occ), col("b") <= col("k"))
      .groupBy(col("k")).agg(sum(col("occ")).as("cum_tokens"))
    val cumD = ks.join(broadcast(fst), col("fb") <= col("k"))
      .groupBy(col("k")).agg(sum(col("nd")).as("cum_distinct"))
    cumT.join(cumD, "k")
      .select((col("k") + 1).as("checkpoint"), col("cum_tokens"),
        col("cum_distinct"))
      .orderBy(col("checkpoint"))
  }

  val q179Sql: String =
    """WITH nn AS (SELECT MAX(doc_id) + 1 AS N FROM documents),
      |tok AS (
      |  SELECT CAST((doc_id * 10) // N AS INT) AS b,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents CROSS JOIN nn),
      |occ AS (SELECT b, COUNT(*) AS occ FROM tok GROUP BY b),
      |fstb AS (SELECT MIN(b) AS fb FROM tok GROUP BY w),
      |fst AS (SELECT fb, COUNT(*) AS nd FROM fstb GROUP BY fb),
      |ks AS (SELECT DISTINCT b AS k FROM occ),
      |ct AS (
      |  SELECT k, CAST(SUM(o.occ) AS BIGINT) AS cum_tokens
      |  FROM ks JOIN occ o ON o.b <= ks.k GROUP BY k),
      |cd AS (
      |  SELECT k, CAST(SUM(f.nd) AS BIGINT) AS cum_distinct
      |  FROM ks JOIN fst f ON f.fb <= ks.k GROUP BY k)
      |SELECT k + 1 AS checkpoint, cum_tokens, cum_distinct
      |FROM ct JOIN cd USING (k) ORDER BY checkpoint""".stripMargin

  // ---------------------------------------------------------------- q180
  /** Zipf rank-frequency slope — q179's companion corpus diagnostic:
    * least-squares fit of ln(count) against ln(rank) over the top
    * 1000 tokens (Zipf 1949; slope ≈ −1 for natural text, flatter
    * for template/boilerplate corpora, steeper after aggressive
    * dedup). Portability: each ln is rounded once at scale 9 (the
    * q172/q173 discipline), the regression sufficient statistics
    * accumulate as exact DECIMALs (order-independent), and the final
    * slope/intercept/r² arithmetic runs on doubles cast from those
    * exact sums — bit-equal across engines.
    *
    * Scale: token counts partial-aggregate in one shuffle; top-1000
    * is a TakeOrdered (map-side heaps, no global sort); the ranking
    * window sits above the limit (≤ 1000 rows — the plan-audit
    * gate's bounded exemption); the fit is a 1-row aggregate.
    */
  def q180(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1000)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .withColumn("x", round(log(col("rnk").cast("double")), 9))
      .withColumn("y", round(log(col("c").cast("double")), 9))
    top.agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(20,9))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(20,9))")).as("sy"),
        sum(expr("CAST(x * y AS DECIMAL(38,18))")).as("sxy"),
        sum(expr("CAST(x * x AS DECIMAL(38,18))")).as("sxx"),
        sum(expr("CAST(y * y AS DECIMAL(38,18))")).as("syy"))
      .withColumn("dn", expr("CAST(n AS DOUBLE)"))
      .withColumn("cxy", expr(
        "dn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("cxx", expr(
        "dn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
      .withColumn("cyy", expr(
        "dn * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .select(
        col("n").cast("long").as("n_tokens"),
        round(expr("cxy / cxx"), 6).as("slope"),
        round(expr(
          "(CAST(sy AS DOUBLE) - (cxy / cxx) * CAST(sx AS DOUBLE)) / dn"), 6)
          .as("intercept"),
        round(expr("(cxy * cxy) / (cxx * cyy)"), 6).as("r2"))
  }

  val q180Sql: String =
    """WITH cnt AS (
      |  SELECT w, COUNT(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w),
      |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 1000),
      |xy AS (
      |  SELECT ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE)), 9) AS x,
      |    ROUND(ln(CAST(c AS DOUBLE)), 9) AS y
      |  FROM top),
      |s AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(x AS DECIMAL(20,9))) AS sx,
      |    SUM(CAST(y AS DECIMAL(20,9))) AS sy,
      |    SUM(CAST(x * y AS DECIMAL(38,18))) AS sxy,
      |    SUM(CAST(x * x AS DECIMAL(38,18))) AS sxx,
      |    SUM(CAST(y * y AS DECIMAL(38,18))) AS syy
      |  FROM xy),
      |d AS (
      |  SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS dn,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
      |    CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy
      |  FROM s)
      |SELECT n AS n_tokens,
      |  ROUND(cxy / cxx, 6) AS slope,
      |  ROUND((dsy - (cxy / cxx) * dsx) / dn, 6) AS intercept,
      |  ROUND((cxy * cxy) / (cxx * cyy), 6) AS r2
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- q186
  /** Blocklist filtering via the native
    * [[graft.functions.MultiNeedleCount]] expression: every document
    * is scanned once against a phrase blocklist (greedy
    * non-overlapping substring counts, summed across needles) and
    * docs with any hit are emitted with a `blocked` policy flag at
    * ≥ 2 hits — the "unsafe-term filter" stage of a cleaning
    * pipeline.
    *
    * Scale design: the needle array is a plan-time literal inside the
    * generated code, so the whole filter is ONE codegen'd projection
    * over the corpus scan — no explode, no join, no shuffle until the
    * final order. The relational alternative (explode needles ×
    * corpus) shuffles |corpus|·|needles| rows; the oracle replays the
    * per-needle replace-arithmetic instead, which is the same greedy
    * scan. For 10⁴+-needle production blocklists the expression's
    * inner loop swaps for one broadcast Aho–Corasick automaton pass
    * (see the expression scaladoc) with this query unchanged.
    */
  def q186(spark: SparkSession, sfDir: String): DataFrame = {
    val needleSql = Blocklist.map(n => s"'$n'").mkString(", ")
    docs(spark, sfDir)
      .withColumn("n_hits",
        expr(s"multi_needle_count(text, array($needleSql))"))
      .where(col("n_hits") > 0)
      .select(col("doc_id"), col("lang"), col("n_hits"),
        (col("n_hits") >= 2).as("blocked"))
      .orderBy(col("doc_id"))
  }

  private val Blocklist =
    Seq("slow scan", "hash join", "slow slow", "table scan", "slow filter")

  val q186Sql: String = {
    val needleSql = Blocklist.map(n => s"'$n'").mkString(", ")
    s"""WITH nl AS (SELECT unnest([$needleSql]) AS nd),
       |h AS (SELECT doc_id, lang,
       |        CAST(SUM((len(text) - len(replace(text, nd, ''))) // len(nd)) AS BIGINT) AS n_hits
       |      FROM documents CROSS JOIN nl GROUP BY doc_id, lang)
       |SELECT doc_id, lang, n_hits, (n_hits >= 2) AS blocked
       |FROM h WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q187
  /** Per-source unigram KL divergence from the corpus distribution —
    * the domain-skew diagnostic of CCNet-style source curation: a
    * source whose token distribution diverges hard from the corpus
    * (boilerplate, spam, wrong-register text) surfaces with a large
    * D_KL(p_source ‖ p_corpus) = Σ_t p_s(t)·ln(p_s(t)/p(t)).
    *
    * Determinism discipline (the q163/q180 precedent): every term is
    * computed as round((c_st/n_s)·ln((c_st·n)/(c_t·n_s)), 9) from
    * exact integer counts — the integer products stay < 2⁵³ (exact in
    * a double) through ~10¹⁵-token corpora, DECIMAL beyond — then
    * decimal-summed (order-independent) and rounded to 6. KL ≥ 0 with
    * p_s absolutely continuous w.r.t. p by construction (every source
    * token is a corpus token).
    *
    * Scale design: ONE token-level shuffle builds (source, tok)
    * counts; corpus token counts reduce from it on the same `tok` key
    * (vocabulary-sized re-aggregation, no second corpus scan) and
    * join back vocabulary-sized; per-source totals and the corpus
    * total are broadcast scalars. Output is |sources| rows.
    */
  def q187(spark: SparkSession, sfDir: String): DataFrame = {
    val cst = docs(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c_st"))
    val ct = cst.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val ns = cst.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("n_types"))
    val n = cst.agg(sum(col("c_st")).as("n"))
    cst.join(ct, "tok").join(broadcast(ns), "source").crossJoin(broadcast(n))
      .withColumn("term", round(
        (col("c_st").cast("double") / col("n_s").cast("double")) *
          log((col("c_st") * col("n")).cast("double") /
            (col("c_t") * col("n_s")).cast("double")), 9))
      .groupBy(col("source"))
      .agg(min(col("n_s")).as("n_tokens"), min(col("n_types")).as("n_types"),
        round(sum(col("term")
          .cast(org.apache.spark.sql.types.DecimalType(27, 9))).cast("double"), 6)
          .as("kl"))
      .orderBy(col("source"))
  }

  val q187Sql: String =
    """WITH cst AS (
      |  SELECT source, tok, COUNT(*) AS c_st FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY source, tok),
      |ct AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst GROUP BY tok),
      |ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
      |         COUNT(*) AS n_types FROM cst GROUP BY source),
      |n AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst),
      |terms AS (
      |  SELECT source, n_s, n_types,
      |    ROUND((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)) *
      |          ln(CAST(c_st * n AS DOUBLE) / CAST(c_t * n_s AS DOUBLE)), 9) AS term
      |  FROM cst JOIN ct USING (tok) JOIN ns USING (source) CROSS JOIN n)
      |SELECT source, MIN(n_s) AS n_tokens, MIN(n_types) AS n_types,
      |  ROUND(CAST(SUM(CAST(term AS DECIMAL(27, 9))) AS DOUBLE), 6) AS kl
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

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

  // ---------------------------------------------------------------- q197
  /** Per-document n-gram NOVELTY against a training corpus — the
    * train/eval overlap metric behind memorization evals (Carlini et
    * al., "Quantifying memorization across neural language models",
    * arXiv:2202.07646 measures extractable training n-grams; Lee et
    * al. 2022 §5 reports eval-set overlap the same way): for every
    * doc in the held-out slice (doc_id ≡ 8,9 mod 10), the fraction of
    * its 5-token windows NOT present anywhere in the training slice.
    * An eval doc duplicating a training doc scores novelty ≈ 0 — the
    * leakage q73's boolean decontamination flags, graded here as the
    * continuous per-document metric an eval-suite curator thresholds
    * on. Window positions count individually (a window repeated in
    * the doc weighs each occurrence), matching the token-level
    * "fraction memorized" definition.
    *
    * Scale shape: train windows reduce to ONE distinct set (the q73
    * n-gram discipline) and the membership probe is a single
    * equi-join on the window key — eval windows shuffle once; no
    * pair fan-out, no per-doc rescans. Keys here are the window
    * strings themselves (≤ ~40 bytes); at 100 TB the drop-in swap is
    * the 64-bit `poly_hash` of the window — same plan, fixed-width
    * shuffle keys, engine-replayable collisions.
    */
  def q197(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    graft.llm.TextStats.novelty(
        train = d.where(pmod(col("doc_id"), lit(10)) < 8),
        eval = d.where(pmod(col("doc_id"), lit(10)) >= 8),
        keyCols = Seq("doc_id", "lang"), textCol = "text", n = 5)
      .orderBy(col("doc_id"))
  }

  val q197Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS s FROM documents),
      |trw AS (
      |  SELECT DISTINCT w FROM (
      |    SELECT unnest([array_to_string(s[i:i+4], ' ')
      |                   FOR i IN range(1, len(s) - 3)]) AS w
      |    FROM t WHERE doc_id % 10 < 8)),
      |evw AS (
      |  SELECT doc_id, lang,
      |    unnest([array_to_string(s[i:i+4], ' ')
      |            FOR i IN range(1, len(s) - 3)]) AS w
      |  FROM t WHERE doc_id % 10 >= 8),
      |j AS (
      |  SELECT e.doc_id, e.lang,
      |    CASE WHEN tr.w IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM evw e LEFT JOIN trw tr ON tr.w = e.w)
      |SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(hit) AS BIGINT) AS n_seen,
      |  ROUND(1.0 - CAST(SUM(hit) AS DOUBLE) / COUNT(*), 6) AS novelty
      |FROM j GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q200
  /** q197's novelty metric served from a PERSISTED window store
    * ([[graft.llm.TextStats.appendNgramBatch]] /
    * `compactNgramStore` / `noveltyAgainst`) — the never-rescan-
    * history discipline (q109/q113/q122/q159/q175) applied to the
    * train-overlap eval: the training slice arrives as two batches,
    * each of which writes ONLY its own distinct windows
    * (batchId-idempotent; window sets union by concatenation, and a
    * replayed batch adds only duplicate rows, which the semi-join
    * probe ignores — a SET store is replay-safe even after
    * compaction, unlike the additive q198 grid), the store is
    * compacted write-then-swap, and the eval slice probes it. The
    * oracle IS q197's: the incremental build must converge to the
    * one-shot train-window set.
    */
  def q200(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.llm.TextStats
    val n = 5
    val d = docs(spark, sfDir)
    val store = graft.Tables.scratchDir(spark, "ngramstore", sfDir)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    TextStats.appendNgramBatch(d.where(pmod(col("doc_id"), lit(10)) < 4),
      "text", n, store, batchId = Some(0L))
    TextStats.appendNgramBatch(d.where(pmod(col("doc_id"), lit(10)) >= 4 &&
      pmod(col("doc_id"), lit(10)) < 8), "text", n, store, batchId = Some(1L))
    TextStats.compactNgramStore(spark, store)
    TextStats.noveltyAgainst(TextStats.readNgramStore(spark, store),
        d.where(pmod(col("doc_id"), lit(10)) >= 8),
        keyCols = Seq("doc_id", "lang"), textCol = "text", n = n)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q203
  /** Trained quality classifier over the document pool
    * ([[graft.llm.QualityClassifier]]) — the learned filter verb the
    * rule-based selectors (q172 DSIR, q173 Stupid-Backoff, q36
    * heuristics) can't express: hashed bag-of-words + intercept +
    * length features, logistic regression fit by 4 exact-arithmetic
    * full-batch GD rounds, then score + threshold over every doc.
    * The label here is the C4-style length heuristic
    * (n_chars ≥ 300) standing in for human/curated-vs-crawl labels —
    * the synthetic corpus carries no real quality signal (token
    * distributions are flat across langs), so the DEMO label is one
    * the model can provably learn (~91% train accuracy); the
    * pipeline — featurize, train, score, filter — is the verb, and
    * `QualityClassifierSpec` pins that it learns a planted
    * content-based signal too. In the nine-stage pretraining
    * capstone (q184) this slots between the heuristic quality gate
    * and the dedup stages: train on the curated slice, score the
    * pool, keep above threshold.
    *
    * Oracle: the ENTIRE training run is replayed by DuckDB as 4
    * unrolled CTE rounds (the q82/q112 precedent) — per-doc scores
    * hash-checked implies every intermediate weight table matched.
    */
  /** Shared scoring pass behind the classifier family (q203/q207/q208/
    * q209/q220): every doc scored under the q203-configuration model
    * READ FROM THE FROZEN MODEL STORE
    * ([[graft.llm.QualityClassifier.loadOrTrainWeights]]) —
    * train-once/evaluate-many: the first family member a session runs
    * trains and publishes the 66-row weight table; every later one
    * (and q206's streaming scorer) reads it and pays only its own
    * featurize-and-score scan. Training is deterministic, so results
    * — and the shared oracle, which replays training inline — are
    * identical whichever query built the store. Output: (doc_id,
    * label int, score double), eagerly pinned so each consumer
    * aggregates a 1-scan-deep plan. */
  private[queries] val qcCfg =
    graft.llm.QualityClassifier.Config(buckets = 64, eta = 5.0, rounds = 4)

  private[queries] def classifierWeights(spark: SparkSession,
                                         sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val labels = d.select(col("doc_id").as("id"),
      when(col("n_chars") >= 300, 1).otherwise(0).as("y"))
    graft.llm.QualityClassifier.loadOrTrainWeights(d, "doc_id", "text",
      labels, qcCfg, graft.Tables.scratchDir(spark, "qcmodel", sfDir))
  }

  private def classifierScored(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.llm.QualityClassifier
    val d = docs(spark, sfDir)
    val labels = d.select(col("doc_id").as("id"),
      when(col("n_chars") >= 300, 1).otherwise(0).as("y"))
    val w = classifierWeights(spark, sfDir)
    QualityClassifier.score(QualityClassifier.featurize(d, "doc_id", "text", qcCfg), w)
      .join(labels, "id")
      .select(col("id").as("doc_id"), col("y").as("label"), col("score"))
      .localCheckpoint(true)
  }

  def q203(spark: SparkSession, sfDir: String): DataFrame =
    classifierScored(spark, sfDir)
      .withColumn("keep", col("score") >= 0.5)
      .orderBy(col("doc_id"))

  /** The q203 training replay up to a `scored` CTE — shared oracle
    * prefix for q203 (keep/threshold), q207 (calibration bins) and
    * q208 (threshold sweep). */
  private val q203Ctes: String = {
    val ph = graft.functions.PolyHash.duckdbSql("t")
    val B = 64
    val head =
      s"""WITH base AS (
         |  SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
         |    string_split(text, ' ') AS s
         |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
         |meta AS (SELECT doc_id, y, len(s) AS l FROM base),
         |tk AS (SELECT doc_id, $ph % $B AS b
         |       FROM (SELECT doc_id, unnest(s) AS t FROM base)),
         |bow AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n FROM tk GROUP BY 1, 2),
         |f AS (
         |  SELECT doc_id, b, CAST(ROUND(CAST(n AS DOUBLE) / l, 9) AS DECIMAL(12,9)) AS x
         |  FROM bow JOIN meta USING (doc_id)
         |  UNION ALL SELECT doc_id, $B AS b, CAST(1 AS DECIMAL(12,9)) AS x FROM meta
         |  UNION ALL SELECT doc_id, ${B + 1} AS b,
         |    CAST(ROUND(l / 100.0, 9) AS DECIMAL(12,9)) AS x FROM meta),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM meta),
         |w0 AS (SELECT CAST(r.i AS BIGINT) AS b, CAST(0 AS DECIMAL(18,9)) AS w
         |       FROM range(0, ${B + 2}) r(i))""".stripMargin
    val gd = (1 to 4).map { r =>
      s""",
         |e$r AS (
         |  SELECT doc_id, CAST(ROUND(y - ROUND(1.0 / (1.0 + EXP(-CAST(z AS DOUBLE))), 9), 9)
         |    AS DECIMAL(10,9)) AS e
         |  FROM (SELECT doc_id, SUM(x * w) AS z FROM f JOIN w${r - 1} USING (b) GROUP BY doc_id)
         |  JOIN meta USING (doc_id)),
         |g$r AS (SELECT b, SUM(e * x) AS g FROM f JOIN e$r USING (doc_id) GROUP BY b),
         |w$r AS (
         |  SELECT b, CAST(ROUND(CAST(w AS DOUBLE) +
         |    5.0 * CAST(COALESCE(g, 0) AS DOUBLE) / n, 9) AS DECIMAL(18,9)) AS w
         |  FROM w${r - 1} LEFT JOIN g$r USING (b) CROSS JOIN nn)""".stripMargin
    }.mkString
    val tail =
      s""",
         |scored AS (
         |  SELECT m.doc_id, m.y AS label,
         |    ROUND(1.0 / (1.0 + EXP(-CAST(z AS DOUBLE))), 9) AS score
         |  FROM (SELECT doc_id, SUM(x * w) AS z FROM f JOIN w4 USING (b) GROUP BY doc_id) zf
         |  JOIN meta m USING (doc_id))""".stripMargin
    head + gd + tail
  }

  val q203Sql: String =
    s"""$q203Ctes
       |SELECT doc_id, label, score, (score >= 0.5) AS keep
       |FROM scored ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q204
  /** Tokenizer round-trip at corpus scale — BPE DECODE
    * ([[graft.llm.Vocab.bpeDecode]]): learn the same four merges as
    * q120, encode every document with Sennrich's end-of-word marker
    * (the extra terminal subword that makes the flat stream
    * invertible), decode the flat (doc_id, pos, subword) stream back
    * to text, and emit each document's decoded content hash plus an
    * engine-side equality flag against the original. The oracle is
    * the q114/q168 round-trip pattern: it computes the hash STRAIGHT
    * FROM PARQUET (whitespace-normalized — BPE's token alphabet
    * can't represent space runs; this corpus is single-spaced so
    * normalization is the identity), so the identity
    * decode(encode(x)) = x is hash-checked for every document — a
    * lossy merge application, id mapping, position ordering, or
    * marker handling anywhere in the encode/decode pair becomes a
    * parity mismatch.
    */
  def q204(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val merges = graft.llm.Vocab.bpeMerges(d, "text", numMerges = 4)
    val enc = graft.llm.Vocab.bpeEncode(d, "doc_id", "text", merges,
      endOfWord = Some("</w>"))
    val dec = graft.llm.Vocab.bpeDecode(enc, "doc_id")
    val norm = d.select(col("doc_id"), expr(
      "array_join(filter(split(text, ' '), w -> w != ''), ' ')").as("orig"))
    dec.join(norm, "doc_id")
      .select(col("doc_id"), GraftFunctions.polyHash("text").as("decoded_hash"),
        (col("text") === col("orig")).as("matches"))
      .orderBy(col("doc_id"))
  }

  val q204Sql: String = {
    val norm = "array_to_string(list_filter(string_split(text, ' '), w -> len(w) > 0), ' ')"
    s"""SELECT doc_id,
       |  ${graft.functions.PolyHash.duckdbSql(norm)} AS decoded_hash,
       |  TRUE AS matches
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q206
  /** q203's trained quality filter SERVED STREAMING — the production
    * "train offline, score online" shape: the classifier trains once
    * on the static corpus (frozen (B+2)-row weight table), then the
    * documents arrive as three file-source micro-batches and each
    * batch is featurized and scored in `foreachBatch` against the
    * broadcast frozen weights, appending to a batchId-idempotent
    * score store (the q171/q183/q198 replay discipline: a replayed
    * micro-batch whose subdirectory committed skips the write). The
    * oracle IS q203's: streamed per-batch scoring must reproduce the
    * one-shot corpus scoring row-for-row, which pins that
    * featurization is genuinely per-document (any corpus-level
    * statistic leaking into [[graft.llm.QualityClassifier.featurize]]
    * would make batch and corpus features diverge) and that serving
    * never retrains.
    *
    * Scale shape: per micro-batch work is one in-row featurize pass +
    * one broadcast join — no history read, no state beyond the O(B)
    * weight table; the score store appends forever without
    * compaction pressure (one row per doc, row-granular identity).
    */
  def q206(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.llm.QualityClassifier
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val cfg = qcCfg
    val d = docs(spark, sfDir)
    // frozen-model store (shared with the whole classifier family):
    // the streaming scorer reads the same published weights the batch
    // evaluations read — the train-once/evaluate-many lifecycle
    val w = classifierWeights(spark, sfDir)
    val base = graft.Tables.scratchDir(spark, "qcstream", sfDir)
    val stager = graft.streaming.FileStager(spark, base)
    val now = System.currentTimeMillis()
    val src = d.select(col("doc_id"), col("n_chars"), col("text"))
    stager.stage(src.where(col("doc_id") % 3 === 0), "batch1", now - 90000)
    stager.stage(src.where(col("doc_id") % 3 === 1), "batch2", now - 60000)
    stager.stage(src.where(col("doc_id") % 3 === 2), "batch3", now - 30000)
    val store = s"$base/scores"
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stager.srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val bf = QualityClassifier.featurize(batch, "doc_id", "text", cfg)
        val scored = QualityClassifier.score(bf, w)
          .join(batch.select(col("doc_id").as("id"),
            when(col("n_chars") >= 300, 1).otherwise(0).as("y")), "id")
          .select(col("id").as("doc_id"), col("y").as("label"),
            col("score"), (col("score") >= 0.5).as("keep"))
        val sub = s"$store/batch_$bid"
        val ok = new org.apache.hadoop.fs.Path(s"$sub/_SUCCESS")
        if (!ok.getFileSystem(batch.sparkSession.sparkContext
            .hadoopConfiguration).exists(ok))
          scored.write.mode("overwrite").parquet(sub)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.option("recursiveFileLookup", "true").parquet(store)
      .orderBy(col("doc_id"))
  }

  /** Exact score-decile bin: the scale-9 score is lifted to an exact
    * integer (round kills the float ulp) before the decile division,
    * so 0.3 lands in bin 3 in both engines — `floor(score*10)` on raw
    * doubles would bin 0.3 as 2 (0.3·10 = 2.999…96 in IEEE). */
  private val binExpr =
    "least(9, cast(round(score * 1000000000) as bigint) div 100000000)"
  private val binExprDuck =
    "LEAST(9, CAST(round(score * 1000000000) AS BIGINT) // 100000000)"

  // ---------------------------------------------------------------- q207
  /** Calibration audit of the trained quality classifier (q203) —
    * the reliability-diagram verb (Guo et al., "On Calibration of
    * Modern Neural Networks", ICML 2017) every production filter
    * needs before its scores can be thresholded or mixed: scores
    * bucketed into deciles, each bin reporting its size, mean
    * predicted probability and empirical positive rate, and the
    * |confidence − accuracy| gap whose n-weighted sum is ECE. The
    * logistic filter is trusted only where the gap is small; a large
    * top-bin gap means the 0.5 cut of q203 keeps junk with
    * confidence. Arithmetic discipline: bin membership is decided in
    * exact integers (see [[binExpr]]), bin means accumulate the
    * scale-9 score decimals exactly then round once at 6.
    *
    * Scale shape: one aggregation of the scored pool to ≤10 bin rows
    * — partial-aggregated, corpus-independent output; composes with
    * q206's streamed scores unchanged (the store holds the same
    * (doc_id, label, score) rows).
    */
  def q207(spark: SparkSession, sfDir: String): DataFrame =
    classifierScored(spark, sfDir)
      .withColumn("bin", expr(binExpr))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"),
        round(sum(col("score").cast("decimal(12,9)")).cast("double") /
          count(lit(1)), 6).as("avg_score"))
      .withColumn("pos_rate", round(col("pos").cast("double") / col("n"), 6))
      .withColumn("gap", round(abs(col("avg_score") - col("pos_rate")), 6))
      .select(col("bin").cast("int").as("bin"), col("n"), col("pos"),
        col("avg_score"), col("pos_rate"), col("gap"))
      .orderBy(col("bin"))

  val q207Sql: String =
    s"""$q203Ctes,
       |agg AS (
       |  SELECT $binExprDuck AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(label) AS BIGINT) AS pos,
       |    ROUND(CAST(SUM(CAST(score AS DECIMAL(12,9))) AS DOUBLE) / COUNT(*), 6) AS avg_score
       |  FROM scored GROUP BY 1)
       |SELECT CAST(bin AS INT) AS bin, n, pos, avg_score,
       |  ROUND(CAST(pos AS DOUBLE) / n, 6) AS pos_rate,
       |  ROUND(ABS(avg_score - ROUND(CAST(pos AS DOUBLE) / n, 6)), 6) AS gap
       |FROM agg ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q208
  /** Operating-point sweep for the trained filter (q203) — the
    * precision/recall/F1 curve over decile thresholds that picks the
    * production cut: at each threshold t ∈ {0.0, 0.1, …, 0.9}, a doc
    * is kept iff score ≥ t, and the sweep reports the confusion
    * counts and rates. All counts are exact integer cumulative sums
    * down the decile spine; each rate is one rational rounded at 6
    * (F1 computed directly as 2tp/(2tp+fp+fn) — never from the
    * already-rounded precision/recall). Empty cells guard to NULL.
    *
    * Scale shape: the corpus reduces to ≤10 bin rows in one partial
    * aggregation; the cumulative window runs over the 10-row decile
    * spine (bounded by construction, not by data — allowlisted in
    * `PlanAuditSpec` with this justification).
    */
  def q208(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = classifierScored(spark, sfDir)
      .withColumn("bin", expr(binExpr))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
    val spine = spark.range(0, 10).select(col("id").as("t10"))
    val j = spine
      .join(agg.withColumnRenamed("bin", "t10"), Seq("t10"), "left")
      .na.fill(0L, Seq("n", "pos"))
    val cum = Window.orderBy(col("t10").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.withColumn("tp", sum(col("pos")).over(cum))
      .withColumn("fp", sum(col("n") - col("pos")).over(cum))
      .withColumn("fn", sum(col("pos")).over(all) - col("tp"))
      .select(col("t10").cast("int").as("t10"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("prec"),
        when(col("tp") + col("fn") === 0, lit(null))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .as("rec"),
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(null))
          .otherwise(round(lit(2.0) * col("tp") /
            (lit(2) * col("tp") + col("fp") + col("fn")), 6))
          .as("f1"))
      .orderBy(col("t10"))
  }

  val q208Sql: String =
    s"""$q203Ctes,
       |agg AS (
       |  SELECT $binExprDuck AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(label) AS BIGINT) AS pos
       |  FROM scored GROUP BY 1),
       |filled AS (
       |  SELECT s.i AS t10, COALESCE(a.n, 0) AS n, COALESCE(a.pos, 0) AS pos
       |  FROM range(0, 10) s(i) LEFT JOIN agg a ON a.bin = s.i),
       |cum AS (
       |  SELECT t10,
       |    CAST(SUM(pos) OVER (ORDER BY t10 DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
       |    CAST(SUM(n - pos) OVER (ORDER BY t10 DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
       |    CAST(SUM(pos) OVER () AS BIGINT) AS allpos
       |  FROM filled)
       |SELECT CAST(t10 AS INT) AS t10, tp, fp, (allpos - tp) AS fn,
       |  CASE WHEN tp + fp = 0 THEN NULL
       |       ELSE ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS prec,
       |  CASE WHEN allpos = 0 THEN NULL
       |       ELSE ROUND(CAST(tp AS DOUBLE) / allpos, 6) END AS rec,
       |  CASE WHEN 2 * tp + fp + (allpos - tp) = 0 THEN NULL
       |       ELSE ROUND(2.0 * tp / (2 * tp + fp + (allpos - tp)), 6) END AS f1
       |FROM cum ORDER BY t10""".stripMargin

  // ---------------------------------------------------------------- q209
  /** Exact ROC-AUC of the trained quality classifier — the
    * threshold-free ranking metric completing the q207/q208 eval
    * family (Hanley & McNeil 1982: AUC = P(score⁺ > score⁻), the
    * Mann-Whitney U statistic). Computed EXACTLY from the pair
    * identity: 2·U = Σ_groups 2·pos_g·cumneg_<g + pos_g·neg_g (ties
    * count half, kept integer by the doubling), over per-distinct-
    * score groups; AUC = 2U / (2·npos·nneg), one rational rounded
    * at 6.
    *
    * Scale shape: the pool reduces to per-distinct-score groups in
    * one partial aggregation; the cumulative negative count below
    * each group is [[graft.operators.GlobalRank.withPrefixSum]] —
    * range-repartitioned, per-partition windowed, offset by a
    * partition-count-sized table — so NO data-sized single-partition
    * window anywhere (a naked `SUM() OVER (ORDER BY score)` would be
    * exactly the cliff the GlobalRank family removes). The (npos,
    * nneg) totals ride a 1-row broadcast. 2·npos·nneg overflows
    * int64 beyond ~2·10⁹ positives×negatives — widen the U sum to
    * decimal at that scale (q172's documented trade).
    */
  def q209(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = classifierScored(spark, sfDir)
    val groups = scored.groupBy(col("score"))
      .agg(sum(col("label")).cast("long").as("pos_g"),
        sum(lit(1L) - col("label")).cast("long").as("neg_g"))
    val withCum = graft.operators.GlobalRank
      .withPrefixSum(groups, Seq(col("score")), "neg_g", "cumneg")
    val tot = scored.agg(sum(col("label")).cast("long").as("npos"),
      sum(lit(1L) - col("label")).cast("long").as("nneg"))
    withCum
      .select((lit(2L) * col("pos_g") * col("cumneg") +
        col("pos_g") * col("neg_g")).as("u2"))
      .agg(sum(col("u2")).as("u2"))
      .crossJoin(broadcast(tot))
      .select(col("npos"), col("nneg"),
        (col("npos") * col("nneg")).as("pairs"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("npos") * col("nneg")), 6).as("auc"))
  }

  val q209Sql: String =
    s"""$q203Ctes,
       |groups AS (
       |  SELECT score, CAST(SUM(label) AS BIGINT) AS pos_g,
       |    CAST(SUM(1 - label) AS BIGINT) AS neg_g
       |  FROM scored GROUP BY score),
       |cum AS (
       |  SELECT pos_g, neg_g,
       |    CAST(COALESCE(SUM(neg_g) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumneg
       |  FROM groups),
       |tot AS (
       |  SELECT CAST(SUM(label) AS BIGINT) AS npos,
       |    CAST(SUM(1 - label) AS BIGINT) AS nneg
       |  FROM scored),
       |u AS (SELECT CAST(SUM(2 * pos_g * cumneg + pos_g * neg_g) AS BIGINT) AS u2 FROM cum)
       |SELECT npos, nneg, (npos * nneg) AS pairs,
       |  ROUND(CAST(u2 AS DOUBLE) / (2.0 * npos * nneg), 6) AS auc
       |FROM u CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Interpolated Kneser–Ney bigram probabilities
    * ([[graft.llm.TextStats.kneserNeyBigram]], D = 0.75) for the 50
    * most frequent bigrams — the production LM smoothing (continuation
    * -count backoff) next to q74's MLE model and q89's add-one filter.
    * Every factor is a bigint-derived double division in an
    * association order mirrored exactly by the oracle.
    */
  def q210(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextStats.kneserNeyBigram(docs(spark, sfDir), "text")
      .select(col("w1"), col("w2"), col("cnt"), col("ctx_cnt"),
        col("n1p_left"), col("cont_cnt"), round(col("p_kn"), 6).as("p_kn"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(50)

  val q210Sql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS s FROM documents),
      |bg AS (SELECT unnest(s[1:len(s)-1]) AS w1, unnest(s[2:len(s)]) AS w2
      |       FROM d WHERE len(s) >= 2),
      |c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt,
      |          CAST(COUNT(*) AS BIGINT) AS n1p_left
      |        FROM c GROUP BY w1),
      |cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_cnt FROM c GROUP BY w2),
      |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM c)
      |SELECT w1, w2, cnt, ctx_cnt, n1p_left, cont_cnt,
      |  ROUND((CAST(cnt AS DOUBLE) - 0.75) / ctx_cnt
      |      + 0.75 * CAST(n1p_left AS DOUBLE) / ctx_cnt
      |        * (CAST(cont_cnt AS DOUBLE) / n_bigram_types), 6) AS p_kn
      |FROM c JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN b
      |ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q213
  /** Unicode NFC normalization over the corpus — the native
    * [[graft.functions.NfcNormalize]] expression (JDK UAX #15) checked
    * byte-for-byte against DuckDB's utf8proc `nfc_normalize`. The
    * corpus is ASCII-clean, so the query first DECOMPOSES it
    * deterministically (a combining acute U+0301 after every a/e/o/u —
    * the NFD form of á/é/ó/ú), then normalizes: NFC must re-compose
    * every pair into one codepoint, while vowel-free documents (zh)
    * exercise the zero-copy already-normalized fast path. Per-lang
    * codepoint totals before/after make any disagreement visible at
    * single-character resolution.
    *
    * Scale shape: embarrassingly per-row inside whole-stage codegen —
    * the one shuffle is the |langs|-bounded final group-by.
    */
  def q213(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("lang"),
        regexp_replace(col("text"), "([aeou])", "$1\u0301").as("synth"))
      .select(col("lang"), col("synth"),
        expr("nfc_normalize(synth)").as("norm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("synth"))).cast("bigint").as("chars_nfd"),
        sum(length(col("norm"))).cast("bigint").as("chars_nfc"),
        sum(when(col("norm") === col("synth"), 1L).otherwise(0L))
          .cast("bigint").as("n_already_nfc"))
      .orderBy(col("lang"))

  val q213Sql: String =
    """WITH s AS (
      |  SELECT lang,
      |    regexp_replace(text, '([aeou])', '\1' || chr(769), 'g') AS synth
      |  FROM documents),
      |n AS (SELECT lang, synth, nfc_normalize(synth) AS norm FROM s)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(length(synth)) AS BIGINT) AS chars_nfd,
      |  CAST(SUM(length(norm)) AS BIGINT) AS chars_nfc,
      |  CAST(SUM(CASE WHEN norm = synth THEN 1 ELSE 0 END) AS BIGINT) AS n_already_nfc
      |FROM n GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q215
  /** l-diversity audit ([[graft.operators.Quality.lDiversity]], l = 3)
    * over the customer table: quasi-identifiers (nation, market
    * segment), sensitive attribute = account-balance thousands bucket.
    * The release-safety check k-anonymity (q145) cannot make: a large
    * QI group whose members all share one balance bucket still leaks.
    * Reports both classical forms — distinct-value count and entropy
    * (portable-log discipline) — per QI group.
    */
  def q215(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Quality
      .lDiversity(graft.Tables.load(spark, sfDir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000), l = 3)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val q215Sql: String =
    s"""WITH base AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sens
       |  FROM customer),
       |cell AS (
       |  SELECT c_nationkey, c_mktsegment, sens, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM base GROUP BY c_nationkey, c_mktsegment, sens),
       |g AS (
       |  SELECT *, CAST(SUM(cnt) OVER (
       |    PARTITION BY c_nationkey, c_mktsegment) AS BIGINT) AS n_rows
       |  FROM cell),
       |t AS (
       |  SELECT c_nationkey, c_mktsegment, n_rows,
       |    CAST(COUNT(*) AS BIGINT) AS n_sensitive,
       |    ROUND(CAST(0 AS DOUBLE) - CAST(SUM(CAST(ROUND(
       |      (cnt / CAST(n_rows AS DOUBLE)) * LN(cnt / CAST(n_rows AS DOUBLE)),
       |      9) AS DECIMAL(27, 9))) AS DOUBLE), 6) AS entropy
       |  FROM g GROUP BY c_nationkey, c_mktsegment, n_rows)
       |SELECT c_nationkey, c_mktsegment, n_rows, n_sensitive, entropy,
       |  n_sensitive >= 3 AS distinct_ok,
       |  entropy >= ${math.log(3.0)} AS entropy_ok
       |FROM t ORDER BY c_nationkey, c_mktsegment""".stripMargin

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

  // ---------------------------------------------------------------- q220
  /** Split-conformal calibration of the trained classifier (Vovk et
    * al. 2005; the Angelopoulos & Bates 2023 split recipe) — the
    * distribution-free uncertainty layer that completes the q203
    * evaluation suite: a deterministic 20% calibration split
    * (doc_id mod 5), nonconformity = 1 − score of the TRUE class,
    * conformal threshold = the ⌈(n+1)(1−α)⌉-th smallest calibration
    * nonconformity at α = 0.1 (an exact order statistic via
    * [[graft.operators.GlobalRank]] — partition-parallel, never a
    * single-partition sort), then the two conformal guarantees
    * measured on the held-out 80%: achieved coverage (≥ 1−α in
    * expectation under exchangeability) and mean prediction-set size
    * (the efficiency metric — a set of 2 on a binary task means the
    * classifier abstained). Every comparison is between scale-9
    * doubles both engines compute identically.
    */
  def q220(spark: SparkSession, sfDir: String): DataFrame = {
    val withE = classifierScored(spark, sfDir)
      .withColumn("e_true", when(col("label") === 1,
        round(lit(1.0) - col("score"), 9)).otherwise(col("score")))
    val cal = withE.where(col("doc_id") % 5 === 0)
    val hold = withE.where(col("doc_id") % 5 =!= 0)
    val nc = cal.agg(count(lit(1)).as("n_cal"))
    val thr = graft.operators.GlobalRank
      .withGlobalRank(cal.select(col("doc_id"), col("e_true")),
        Seq(col("e_true"), col("doc_id")), "rk")
      .crossJoin(broadcast(nc))
      .where(col("rk") === expr("(9 * (n_cal + 1) + 9) div 10"))
      .select(col("n_cal"), col("rk").as("m"), col("e_true").as("thr"))
    hold.crossJoin(broadcast(thr))
      .groupBy(col("n_cal"), col("m"), col("thr"))
      .agg(count(lit(1)).as("n_eval"),
        round(sum(when(col("e_true") <= col("thr"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("coverage"),
        round(sum(when(round(lit(1.0) - col("score"), 9) <= col("thr"), 1L)
            .otherwise(0L) +
          when(col("score") <= col("thr"), 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("avg_set_size"))
      .select(col("n_cal"), col("m"), col("thr"), col("n_eval"),
        col("coverage"), col("avg_set_size"))
  }

  val q220Sql: String =
    s"""$q203Ctes,
       |ev AS (
       |  SELECT doc_id, label, score,
       |    CASE WHEN label = 1 THEN ROUND(1.0 - score, 9) ELSE score END AS e_true
       |  FROM scored),
       |cal AS (SELECT * FROM ev WHERE doc_id % 5 = 0),
       |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
       |rkd AS (
       |  SELECT e_true,
       |    ROW_NUMBER() OVER (ORDER BY e_true, doc_id) AS rk
       |  FROM cal),
       |th AS (
       |  SELECT n_cal, CAST(rk AS BIGINT) AS m, e_true AS thr
       |  FROM rkd CROSS JOIN nc
       |  WHERE rk = (9 * (n_cal + 1) + 9) // 10),
       |hold AS (SELECT * FROM ev WHERE doc_id % 5 <> 0)
       |SELECT n_cal, m, thr, CAST(COUNT(*) AS BIGINT) AS n_eval,
       |  ROUND(SUM(CASE WHEN e_true <= thr THEN 1 ELSE 0 END) /
       |    CAST(COUNT(*) AS DOUBLE), 6) AS coverage,
       |  ROUND(SUM((CASE WHEN ROUND(1.0 - score, 9) <= thr THEN 1 ELSE 0 END) +
       |            (CASE WHEN score <= thr THEN 1 ELSE 0 END)) /
       |    CAST(COUNT(*) AS DOUBLE), 6) AS avg_set_size
       |FROM hold CROSS JOIN th
       |GROUP BY n_cal, m, thr""".stripMargin

  // ------------------------------------------------------ q223/q224/q225
  // Unigram-LM tokenizer (SentencePiece family) — oracle CTE builders.
  // The DP unrolls over word positions (words are truncated to
  // UnigramMaxW codepoints BEFORE the distinct, both engines), each
  // position joining the ≤ UnigramMaxP prior best-states against the
  // round's vocabulary; backtracking unrolls the same depth. Every
  // stage is MATERIALIZED: the b-chain references each prior level up
  // to 4 times and DuckDB's default CTE inlining would re-expand it
  // exponentially (the q222 lesson).
  private val UnigramMaxW = 12 // max word codepoints (bounds the DP unroll)
  private val UnigramMaxP = 4  // max piece codepoints
  private val UnigramMulti = 64 // multi-char seed vocabulary size
  private val UnigramRounds = 2 // hard-EM rounds

  /** One Viterbi DP + backtrack over `dw` against vocabulary scores
    * `lpTab`, producing `{p}pieces` = (word, k, piece) with k the
    * 1-based step FROM THE WORD END. */
  private def unigramDpCtes(p: String, lpTab: String): String = {
    val bs = (1 to UnigramMaxW).map { i =>
      val priors = (math.max(0, i - UnigramMaxP) until i)
        .map(j => s"SELECT * FROM ${p}b$j").mkString(" UNION ALL ")
      s"""${p}b$i AS MATERIALIZED (
         |  SELECT word, i, s, j FROM (
         |    SELECT b.word, $i AS i, b.s + v.lp AS s, b.i AS j,
         |      ROW_NUMBER() OVER (PARTITION BY b.word
         |        ORDER BY b.s + v.lp DESC, b.i) AS rn
         |    FROM ($priors) b
         |    JOIN $lpTab v ON v.piece = substr(b.word, b.i + 1, $i - b.i)
         |    WHERE length(b.word) >= $i) WHERE rn = 1)""".stripMargin
    }
    val ball = s"""${p}ball AS MATERIALIZED (${(1 to UnigramMaxW)
      .map(i => s"SELECT * FROM ${p}b$i").mkString(" UNION ALL ")})"""
    val ts = (1 to UnigramMaxW).map { k =>
      s"""${p}p$k AS MATERIALIZED (
         |  SELECT t.word, b.j, t.i, $k AS k,
         |    substr(t.word, b.j + 1, t.i - b.j) AS piece
         |  FROM ${p}t${k - 1} t JOIN ${p}ball b ON b.word = t.word AND b.i = t.i
         |  WHERE t.i > 0),
         |${p}t$k AS (SELECT word, j AS i FROM ${p}p$k)""".stripMargin
    }
    val pieces = s"""${p}pieces AS MATERIALIZED (${(1 to UnigramMaxW)
      .map(i => s"SELECT word, k, piece FROM ${p}p$i").mkString(" UNION ALL ")})"""
    (s"""${p}b0 AS MATERIALIZED (
        |  SELECT word, 0 AS i, CAST(0 AS DECIMAL(27,9)) AS s, 0 AS j FROM dw)""".stripMargin
      +: bs) ++ Seq(
      ball,
      s"${p}t0 AS (SELECT word, length(word) AS i FROM dw)") ++
      ts :+ pieces
  }.mkString(",\n")

  /** lp table of a vocabulary CTE: portable-log piece scores. */
  private def unigramLpCte(name: String, vocab: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(ROUND(ln(CAST(cnt AS DOUBLE) / t.t), 9) AS DECIMAL(27,9)) AS lp
       |  FROM $vocab CROSS JOIN
       |    (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM $vocab) t)""".stripMargin

  /** The full training chain: corpus → seed → `UnigramRounds` of
    * (lp → DP → votes → pruned/floored vocab). Ends at v$UnigramRounds. */
  private def unigramTrainCtes: String = {
    val head =
      s"""w0 AS MATERIALIZED (
         |  SELECT substr(word, 1, $UnigramMaxW) AS word,
         |    CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE length(word) > 0 GROUP BY 1),
         |dw AS MATERIALIZED (SELECT word FROM w0),
         |sub AS MATERIALIZED (
         |  SELECT substr(word, s.i + 1, l.j) AS piece,
         |    CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM w0 CROSS JOIN range(0, $UnigramMaxW) s(i)
         |    CROSS JOIN range(1, ${UnigramMaxP + 1}) l(j)
         |  WHERE s.i + l.j <= length(word) GROUP BY 1),
         |v0 AS MATERIALIZED (
         |  SELECT piece, cnt FROM sub WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM sub WHERE length(piece) >= 2) WHERE rn <= $UnigramMulti)""".stripMargin
    val rounds = (1 to UnigramRounds).map { r =>
      s"""${unigramLpCte(s"lp${r - 1}", s"v${r - 1}")},
         |${unigramDpCtes(s"r${r}_", s"lp${r - 1}")},
         |votes$r AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM r${r}_pieces JOIN w0 USING (word) GROUP BY piece),
         |v$r AS MATERIALIZED (
         |  SELECT v.piece, GREATEST(COALESCE(vt.cnt, 0), 1) AS cnt
         |  FROM v${r - 1} v LEFT JOIN votes$r vt USING (piece)
         |  WHERE length(v.piece) = 1
         |  UNION ALL
         |  SELECT v.piece, vt.cnt FROM v${r - 1} v JOIN votes$r vt USING (piece)
         |  WHERE length(v.piece) >= 2)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Encode chain on top of training: segment `dw` under the final
    * vocabulary and aggregate per-word piece stats. */
  private def unigramEncodeCtes: String =
    s"""${unigramLpCte("lpf", s"v$UnigramRounds")},
       |${unigramDpCtes("enc_", "lpf")},
       |wnp AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS np
       |        FROM enc_pieces GROUP BY word),
       |wfp AS MATERIALIZED (
       |  SELECT p.word, ANY_VALUE(w.np) AS np,
       |    CAST(SUM((w.np - p.k + 1) *
       |      (${graft.functions.PolyHash.duckdbSql("p.piece")})) AS BIGINT) AS fp,
       |    CASE WHEN string_agg(p.piece, '' ORDER BY p.k DESC) = p.word
       |         THEN 0 ELSE 1 END AS rt_fail
       |  FROM enc_pieces p JOIN wnp w USING (word) GROUP BY p.word)""".stripMargin

  /** Unigram-LM tokenizer TRAINING ([[graft.llm.UnigramLM.train]]):
    * all-substring seed vocabulary (every char + top-64 multi-char by
    * weighted count), then 2 rounds of determinized Viterbi hard-EM —
    * segment every distinct word under ln(c/T) scores (portable-log
    * fixed-point, exact max-plus DP), recount pieces from the Viterbi
    * segmentations, prune unused multi-char pieces, floor chars at 1.
    * Output: the final (piece, cnt) vocabulary. The oracle unrolls
    * the ENTIRE training — seed, both DP/backtrack rounds, prune —
    * as ~90 materialized CTEs, so seeding, scoring, tie-breaks,
    * pruning and the char floor are all hash-checked.
    */
  def q223(spark: SparkSession, sfDir: String): DataFrame = {
    val s = spark
    import s.implicits._
    graft.llm.UnigramLM
      .train(docs(spark, sfDir), "text", rounds = UnigramRounds,
        maxWordLen = UnigramMaxW, maxPieceLen = UnigramMaxP,
        maxMulti = UnigramMulti)
      .map(p => (p.piece, p.cnt)).toDF("piece", "cnt")
      .orderBy(col("piece"))
  }

  val q223Sql: String =
    s"""WITH $unigramTrainCtes
       |SELECT piece, cnt FROM v$UnigramRounds ORDER BY piece""".stripMargin

  /** Unigram-LM ENCODE + round-trip ([[graft.llm.UnigramLM.encode]] /
    * `decode`): the trained tokenizer segments the corpus; per
    * document the query pins the word count, total piece count, an
    * order-sensitive fingerprint Σ (piece_index+1)·poly_hash(piece)
    * over every word's segmentation, and the number of words whose
    * pieces do NOT concatenate back to the word (must be 0 — the
    * decode identity, asserted through real data rather than by
    * construction). Scale: train on the distinct-word table, one
    * broadcast of the word→pieces map onto the token stream.
    */
  def q224(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val vocab = graft.llm.UnigramLM.train(d, "text", rounds = UnigramRounds,
      maxWordLen = UnigramMaxW, maxPieceLen = UnigramMaxP,
      maxMulti = UnigramMulti)
    val wp = graft.llm.UnigramLM
      .wordPieces(d, "text", vocab, UnigramMaxW, UnigramMaxP)
      .localCheckpoint() // one segmentation pass, three consumers
    val wordStats = wp
      .select(col("word"), posexplode(col("pieces")).as(Seq("ppos", "piece")))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("np"),
        sum((col("ppos") + 1) * GraftFunctions.polyHash("piece")).as("fp"))
      .join(wp.select(col("word"),
        when(concat_ws("", col("pieces")) === col("word"), 0L)
          .otherwise(1L).as("rt_fail")), "word")
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), substring(col("w"), 1, UnigramMaxW).as("word"))
      .join(broadcast(wordStats), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"),
        sum(col("fp")).as("fp"), sum(col("rt_fail")).as("n_rt_fail"))
      .orderBy(col("doc_id"))
  }

  val q224Sql: String =
    s"""WITH $unigramTrainCtes,
       |$unigramEncodeCtes,
       |toks AS (
       |  SELECT doc_id, substr(word, 1, $UnigramMaxW) AS word
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(fp) AS BIGINT) AS fp,
       |  CAST(SUM(rt_fail) AS BIGINT) AS n_rt_fail
       |FROM toks JOIN wfp USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q162's fertility/compression evaluation RERUN under the unigram
    * tokenizer — the cross-family comparison the two-tokenizer engine
    * exists for (BPE fertility: q162). Stats are over the
    * truncated-word corpus the tokenizer is defined on: n_words,
    * pieces per word (fertility), characters per piece (compression),
    * per language.
    */
  def q225(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val vocab = graft.llm.UnigramLM.train(d, "text", rounds = UnigramRounds,
      maxWordLen = UnigramMaxW, maxPieceLen = UnigramMaxP,
      maxMulti = UnigramMulti)
    val wp = graft.llm.UnigramLM
      .wordPieces(d, "text", vocab, UnigramMaxW, UnigramMaxP)
      .select(col("word"), size(col("pieces")).cast("long").as("np"))
    d.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("lang"), substring(col("w"), 1, UnigramMaxW).as("word"))
      .join(broadcast(wp), "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_pieces"), col("n_chars"),
        round(col("n_pieces") / col("n_words").cast("double"), 6).as("fertility"),
        round(col("n_chars") / col("n_pieces").cast("double"), 6)
          .as("chars_per_piece"))
      .orderBy(col("lang"))
  }

  val q225Sql: String =
    s"""WITH $unigramTrainCtes,
       |$unigramEncodeCtes,
       |toks AS (
       |  SELECT lang, substr(word, 1, $UnigramMaxW) AS word
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE length(word) > 0)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(length(word)) AS BIGINT) AS n_chars,
       |  ROUND(SUM(np) / CAST(COUNT(*) AS DOUBLE), 6) AS fertility,
       |  ROUND(SUM(length(word)) / CAST(SUM(np) AS DOUBLE), 6) AS chars_per_piece
       |FROM toks JOIN wfp USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q34_token_stats", q34 _, Some(q34Sql)),
    ("q35_lang_id_confusion", q35 _, Some(q35Sql)),
    ("q36_quality_score", q36 _, Some(q36Sql)),
    ("q37_winnow_fingerprint", q37 _, Some(q37Sql)),
    ("q52_stratified_hash_sample", q52 _, Some(q52Sql)),
    ("q59_repetition_quality", q59 _, Some(q59Sql)),
    ("q63_pii_redaction", q63 _, Some(q63Sql)),
    ("q65_vocab_encode", q65 _, Some(q65Sql)),
    ("q66_tfidf_search", q66 _, Some(q66Sql)),
    ("q67_chunk_windows", q67 _, Some(q67Sql)),
    ("q70_sequence_pack", q70 _, Some(q70Sql)),
    ("q74_bigram_model", q74 _, Some(q74Sql)),
    ("q85_heavy_hitters", q85 _, Some(q85Sql)),
    ("q89_bigram_surprise", q89 _, Some(q89Sql)),
    ("q90_bm25_search", q90 _, Some(q90Sql)),
    ("q91_domain_quota", q91 _, Some(q91Sql)),
    ("q97_chisq_independence", q97 _, Some(q97Sql)),
    ("q100_weighted_allocation", q100 _, Some(q100Sql)),
    ("q112_bpe_merges", q112 _, Some(q112Sql)),
    ("q114_lineformat_roundtrip", q114 _, Some(q114Sql)),
    ("q168_xml_roundtrip", q168 _, Some(q168Sql)),
    ("q120_bpe_encode", q120 _, Some(q120Sql)),
    ("q127_temperature_mixture", q127 _, Some(q127Sql)),
    ("q128_tokenize_pack", q128 _, Some(q128Sql)),
    ("q133_lm_examples", q133 _, Some(q133Sql)),
    ("q137_phrase_search", q137 _, Some(q137Sql)),
    ("q144_weighted_sample", q144 _, Some(q144Sql)),
    ("q145_k_anonymity", q145 _, Some(q145Sql)),
    ("q148_fd_audit", q148 _, Some(q148Sql)),
    ("q152_skipgram_pairs", q152 _, Some(q152Sql)),
    ("q158_rrf_fusion", q158 _, Some(q158Sql)),
    // oracle = q90's full-corpus BM25: merged sufficient statistics
    // must reproduce the from-scratch ranking exactly (q122's
    // reuse-the-batch-oracle precedent)
    ("q159_bm25_incremental", q159 _, Some(q90Sql)),
    ("q162_tokenizer_fertility", q162 _, Some(q162Sql)),
    ("q163_collocation_lift", q163 _, Some(q163Sql)),
    ("q172_dsir_sample", q172 _, Some(q172Sql)),
    ("q173_lm_quality_filter", q173 _, Some(q173Sql)),
    ("q179_heaps_curve", q179 _, Some(q179Sql)),
    ("q180_zipf_fit", q180 _, Some(q180Sql)),
    ("q186_blocklist_filter", q186 _, Some(q186Sql)),
    ("q187_source_kl_divergence", q187 _, Some(q187Sql)),
    // oracle = q90's exhaustive BM25: the MaxScore prune must
    // reproduce the full ranking exactly (the q159/q122 precedent of
    // sharing the unpruned oracle)
    ("q188_bm25_maxscore", q188 _, Some(q90Sql)),
    // oracle = q90's exhaustive BM25 again: the champion-list serving
    // path (or its provably-needed fallback) must reproduce the full
    // ranking exactly
    ("q189_bm25_champion_lists", q189 _, Some(q90Sql)),
    ("q197_ngram_novelty", q197 _, Some(q197Sql)),
    // oracle = q197's: the incrementally-built window store must
    // converge to the one-shot train-window set (the q183/q198
    // shared-oracle precedent)
    ("q200_novelty_store", q200 _, Some(q197Sql)),
    ("q203_quality_classifier", q203 _, Some(q203Sql)),
    ("q204_bpe_decode_roundtrip", q204 _, Some(q204Sql)),
    // oracle = q203's: streamed frozen-weight scoring must reproduce
    // the one-shot corpus scoring row-for-row (the q159/q188/q198
    // shared-oracle precedent)
    ("q206_stream_quality_scoring", q206 _, Some(q203Sql)),
    ("q207_classifier_calibration", q207 _, Some(q207Sql)),
    ("q208_threshold_sweep", q208 _, Some(q208Sql)),
    ("q209_classifier_auc", q209 _, Some(q209Sql)),
    ("q210_kneser_ney_bigram", q210 _, Some(q210Sql)),
    ("q213_unicode_normalize", q213 _, Some(q213Sql)),
    ("q215_l_diversity", q215 _, Some(q215Sql)),
    ("q218_qld_search", q218 _, Some(q218Sql)),
    ("q220_conformal_coverage", q220 _, Some(q220Sql)),
    ("q223_unigram_train", q223 _, Some(q223Sql)),
    ("q224_unigram_encode_roundtrip", q224 _, Some(q224Sql)),
    ("q225_unigram_fertility", q225 _, Some(q225Sql))
  )

}
