package graft.queries

import graft.Tables
import graft.functions.{GraftFunctions, PolyHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the LLM-pipeline family
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Every pipeline here is *arithmetically portable*: shingle hashing
  * uses [[graft.functions.PolyHash]] (a codegen'd Catalyst expression
  * whose value any SQL engine can reproduce with a `list_reduce`), so
  * the DuckDB oracle recomputes the identical MinHash signatures, LSH
  * buckets and SimHash fingerprints — the full pipeline is
  * hash-checked, not just row counts.
  *
  * Scale design (the 100 TB lens):
  *  - exact dedup shuffles once on the content hash — never on the
  *    text itself (256-bit key vs KBs of payload);
  *  - the Jaccard near-dup join is *prefix-filtered* (PPJoin-style):
  *    candidates must share a shingle among their rarest
  *    `|S| - ceil(t|S|) + 1` shingles (global rarity order), which is
  *    lossless for Jaccard ≥ t and prunes the quadratic blow-up that a
  *    naive shared-shingle join hits on stop-shingles;
  *  - MinHash/LSH replaces the all-pairs problem with equi-joins on
  *    band keys — the candidate set is per-bucket quadratic, not
  *    global;
  *  - SimHash bands (4×8 bits) are pigeonhole-lossless for hamming ≤ 3.
  */
object Dedup {
  private val P = PolyHash.Mod // 2^31 - 1

  private def docs(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables.load(spark, sfDir, "documents")
  }

  /** DuckDB fragment mirroring [[graft.llm.TextDedup.hashedShingles]]'s
    * string-shingle stage (1-based list indexing). */
  private def shinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"s[i+$k]").mkString(" || ' ' || ")
    s"""sh AS (
       |  SELECT doc_id, list_distinct([$parts for i in range(1, len(s) - ${n - 2})]) AS shingles
       |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
       |  WHERE len(s) >= $n
       |)""".stripMargin
  }

  /** Exact-text-contracted shingle pipeline — the scale-tractable form
    * of the pair-generating oracles.
    *
    * Shingle sets, Jaccard, containment, MinHash signatures and LSH
    * band keys are all PURE FUNCTIONS of the text, so identical texts
    * are interchangeable in every pair pipeline. The contraction
    * groups `documents` by text (grp: one representative `rep` =
    * MIN(doc_id), member list, count), runs the quadratic
    * candidate/verify stages over DISTINCT TEXTS ONLY, and expands
    * group-level results back to doc pairs through the membership
    * list. Exactly lossless at every scale — and on duplicate-dense
    * data (the sf1 scale-up replicates every text 10×) it removes the
    * 100× candidate blow-up that made the uncontracted oracles time
    * out: posting lists shrink from 10c to c per shingle, so the
    * shared-shingle join is sf0.1-sized at sf1. Intra-group pairs
    * (identical texts, Jaccard exactly 1) are emitted arithmetically
    * for eligible groups (>= n words, so the shingle set is nonempty)
    * instead of ever being joined.
    *
    * Emits CTEs: grp(rep, cnt, ids, elig, text), sh, hsh, ex, cand,
    * mem(rep, doc_id) — `cand` is the rep-level shared-shingle
    * candidate list (a.doc_id < b.doc_id on reps), verify stages are
    * per-query.
    */
  private def contractedShinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"s[i+$k]").mkString(" || ' ' || ")
    s"""grp AS (
       |  SELECT MIN(doc_id) AS rep, COUNT(*) AS cnt, list(doc_id) AS ids,
       |         len(string_split(text, ' ')) >= $n AS elig, text
       |  FROM documents GROUP BY text),
       |sh AS (
       |  SELECT rep AS doc_id, list_distinct([$parts for i in range(1, len(s) - ${n - 2})]) AS shingles
       |  FROM (SELECT rep, string_split(text, ' ') AS s FROM grp)
       |  WHERE len(s) >= $n),
       |hsh AS (SELECT doc_id,
       |          list_distinct(list_transform(shingles, s -> ${PolyHash.duckdbSql("s")})) AS hs
       |        FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM hsh),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id),
       |mem AS (SELECT rep, unnest(ids) AS doc_id FROM grp)""".stripMargin
  }

  /** Contracted rep-level Jaccard pairs + min-label closure + per-doc
    * expansion, shared by the cluster-consuming oracles (q54, q119,
    * q155). Appends to [[contractedShinglesSql]]'s CTEs:
    * rpairs (rep pairs with jac >= tNum/tDen), edges/reach/glab (the
    * recursive closure over the CONTRACTED graph — components and
    * their min labels are preserved because every member of a group
    * is pairwise-connected at Jaccard 1 and inherits the group's
    * external edges), and alldocs(doc_id, cluster_id) where a group
    * whose rep is unlabeled but has >= 2 eligible members is its own
    * component (label = rep; the component minimum, since rep is the
    * group's min id) and everything else is a singleton.
    * Must be used under `WITH RECURSIVE`.
    */
  private def contractedClosureSql(n: Int, tNum: Int, tDen: Int): String =
    s"""${contractedShinglesSql(n)},
       |rpairs AS (SELECT d1, d2 FROM (
       |  SELECT d1, d2,
       |    len(list_intersect(x.hs, y.hs)) /
       |    CAST(len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS jac
       |  FROM cand JOIN hsh x ON x.doc_id = d1 JOIN hsh y ON y.doc_id = d2)
       |  WHERE jac >= ${tNum.toDouble / tDen}),
       |edges AS (SELECT d1 AS u, d2 AS v FROM rpairs
       |          UNION SELECT d2, d1 FROM rpairs),
       |reach(u, v) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |glab AS (SELECT u AS rep, MIN(v) AS cluster_id FROM reach GROUP BY u),
       |memx AS (SELECT g.rep, g.cnt, g.elig, m.doc_id
       |         FROM grp g JOIN mem m ON m.rep = g.rep),
       |alldocs AS (
       |  SELECT m.doc_id,
       |    CASE WHEN l.cluster_id IS NOT NULL THEN l.cluster_id
       |         WHEN m.elig AND m.cnt >= 2 THEN m.rep
       |         ELSE m.doc_id END AS cluster_id,
       |    (l.cluster_id IS NOT NULL OR (m.elig AND m.cnt >= 2)) AS clustered
       |  FROM memx m LEFT JOIN glab l ON l.rep = m.rep)""".stripMargin

  // ---------------------------------------------------------------- q27
  /** Exact dedup: content-hash grouping, min-id survivor policy.
    * One shuffle on the 256-bit hash; the re-join to per-doc rows is a
    * broadcast at dim scale and a hash join on the same key otherwise.
    */
  def q27(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup.exactDuplicates(docs(spark, sfDir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q27Sql: String =
    """WITH h AS (SELECT doc_id, sha256(text) AS text_sha FROM documents),
      |g AS (SELECT text_sha, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
      |      FROM h GROUP BY text_sha)
      |SELECT doc_id, h.text_sha, n_copies, (doc_id = keep_id) AS kept
      |FROM h JOIN g USING (text_sha) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q28
  /** N-gram Jaccard near-dup join, prefix-filtered.
    *
    * Jaccard ≥ 3/5 over distinct word 3-grams. Prefix length uses
    * exact integer arithmetic (`ceil(3·sz/5) = (3·sz+4) div 5`) — a
    * float `ceil(0.6*sz)` can overshoot at representation boundaries
    * and silently break the lossless guarantee.
    */
  def q28(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .jaccardNearDupPairs(docs(spark, sfDir), "doc_id", "text", n = 3, tNum = 3, tDen = 5)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jac"))
      .orderBy(col("d1"), col("d2"))

  val q28Sql: String =
    s"""WITH ${contractedShinglesSql(3)},
       |rj AS (SELECT d1, d2, jac FROM (
       |  SELECT d1, d2,
       |    len(list_intersect(x.hs, y.hs)) /
       |    CAST(len(x.hs) + len(y.hs)
       |         - len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS jac
       |  FROM cand JOIN hsh x ON x.doc_id = d1 JOIN hsh y ON y.doc_id = d2)
       |  WHERE jac >= 0.6),
       |inter_p AS (
       |  SELECT LEAST(a.doc_id, b.doc_id) AS d1,
       |         GREATEST(a.doc_id, b.doc_id) AS d2, rj.jac
       |  FROM rj JOIN mem a ON a.rep = rj.d1 JOIN mem b ON b.rep = rj.d2),
       |intra_p AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, 1.0::DOUBLE AS jac
       |  FROM grp g JOIN mem a ON a.rep = g.rep JOIN mem b ON b.rep = g.rep
       |  WHERE g.elig AND g.cnt >= 2 AND a.doc_id < b.doc_id)
       |SELECT d1, d2, ROUND(jac, 6) AS jac FROM (
       |  SELECT * FROM inter_p UNION ALL SELECT * FROM intra_p)
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q29
  /** MinHash signatures + LSH banding + verification.
    *
    * 12 portable hash functions `h_i(x) = (a_i·x + b_i) mod (2^31-1)`
    * over poly-hashed 3-gram shingles; 4 bands × 3 rows. Candidates
    * share at least one full band key; each candidate carries its
    * signature-estimated similarity and the exact Jaccard.
    */
  def q29(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .minHashLshPairs(docs(spark, sfDir), "doc_id", "text", n = 3, k = 12, bands = 4)
      .select(col("d1"), col("d2"), round(col("est_sim"), 6).as("est_sim"),
        round(col("jac"), 6).as("jac"))
      .orderBy(col("d1"), col("d2"))

  val q29Sql: String =
    s"""WITH ${shinglesSql(3)},
       |hsh AS (SELECT doc_id,
       |          list_distinct(list_transform(shingles, s -> ${PolyHash.duckdbSql("s")})) AS hs
       |        FROM sh),
       |hx AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
       |params AS (SELECT i, (i*7919 + 1) % $P AS a, (i*104729 + 12345) % $P AS b
       |           FROM range(0, 12) t(i)),
       |sig AS (SELECT doc_id, i, MIN((a*x + b) % $P) AS mh
       |        FROM hx CROSS JOIN params GROUP BY doc_id, i),
       |bandkey AS (SELECT doc_id, i // 3 AS band,
       |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |            FROM sig GROUP BY doc_id, i // 3),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bandkey a JOIN bandkey b
       |         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |est AS (SELECT d1, d2,
       |          SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / 12.0 AS est_sim
       |        FROM cand
       |        JOIN sig m1 ON m1.doc_id = d1 JOIN sig m2 ON m2.doc_id = d2 AND m1.i = m2.i
       |        GROUP BY d1, d2)
       |SELECT d1, d2, ROUND(est_sim, 6) AS est_sim,
       |  ROUND(len(list_intersect(x.hs, y.hs)) /
       |        CAST(len(x.hs) + len(y.hs)
       |             - len(list_intersect(x.hs, y.hs)) AS DOUBLE), 6) AS jac
       |FROM est JOIN hsh x ON x.doc_id = d1 JOIN hsh y ON y.doc_id = d2
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q30
  /** SimHash near-dup: 32-bit weighted-bigram fingerprints, 4×8-bit
    * band blocking (lossless for hamming ≤ 3), XOR popcount verify.
    */
  def q30(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .simHashPairs(docs(spark, sfDir), "doc_id", "text",
        n = 2, bits = 32, bands = 4, maxHamming = 3)
      .orderBy(col("d1"), col("d2"))

  val q30Sql: String =
    s"""WITH grams AS (
       |  SELECT doc_id, g.gram, COUNT(*) AS w FROM (
       |    SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS gram
       |    FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
       |    WHERE len(s) >= 2) g
       |  GROUP BY doc_id, g.gram),
       |hx AS (SELECT doc_id, ${PolyHash.duckdbSql("gram")} AS x, w FROM grams),
       |bits AS (SELECT doc_id, j, SUM((((x >> j) & 1) * 2 - 1) * w) AS s
       |         FROM hx CROSS JOIN range(0, 32) t(j) GROUP BY doc_id, j),
       |fps AS (SELECT doc_id,
       |          CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fp
       |        FROM bits GROUP BY doc_id),
       |banded AS (SELECT doc_id, fp, band, (fp >> (band * 8)) & 255 AS bkey
       |           FROM fps CROSS JOIN range(0, 4) t(band)),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |                a.fp AS fp1, b.fp AS fp2
       |         FROM banded a JOIN banded b
       |         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT d1, d2, fp1, fp2, CAST(bit_count(xor(fp1, fp2)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 3
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Near-dup clusters: q28's pair list resolved into connected
    * components with min-id cluster labels — the step that turns
    * pairwise matches into dedup groups. The oracle walks the same
    * pair list with a recursive transitive closure.
    */
  def q54(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = graft.llm.TextDedup
      .jaccardNearDupPairs(docs(spark, sfDir), "doc_id", "text", n = 3, tNum = 3, tDen = 5)
    graft.llm.TextDedup.connectedComponents(pairs, "d1", "d2")
      .withColumn("kept", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  val q54Sql: String =
    // contracted pair pipeline + closure over the distinct-text graph
    // ([[contractedClosureSql]]); output = docs that appear in pairs,
    // i.e. members of labeled or multi-member eligible groups
    s"""WITH RECURSIVE ${contractedClosureSql(3, 3, 5)}
       |SELECT doc_id, cluster_id, (doc_id = cluster_id) AS kept
       |FROM alldocs WHERE clustered ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q155
  /** INCREMENTAL connected-components maintenance: q54's clustering as
    * a refresh. History (80% of docs, `doc_id % 5 != 0`) was clustered
    * in a previous run and persisted as two stores — min-id labels and
    * the [[graft.llm.TextDedup.writeSignatureStore]] shingle sets; the
    * new batch (`doc_id % 5 == 0`) is then merged WITHOUT re-pairing
    * or even re-reading history text:
    *  - batch↔history edges come from a shared-shingle join against
    *    the signature store (exact Jaccard on stored sets — lossless,
    *    same edge definition as q54's oracle);
    *  - batch↔batch edges from the prefix-filtered pair join on the
    *    batch alone;
    *  - history's internal structure enters as STAR EDGES
    *    (member → stored root), so the merge graph has
    *    |history| + |new edges| edges instead of history's full pair
    *    list — and a batch doc bridging two old clusters correctly
    *    collapses them (root_A and root_B are both endpoints, so the
    *    new min propagates).
    * Stored roots are component minima, so merged labels equal the
    * from-scratch q54 labels — which is exactly what the oracle
    * checks (full recompute, restricted to batch docs).
    *
    * Scale: the expensive stage at 100 TB is pair generation over
    * history (quadratic-ish in bucket sizes); this refresh pays it
    * only for batch-sized inputs, plus one equi-join against stored
    * signatures. CC itself runs on the contracted star graph.
    */
  def q155(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    ccIncremental(
      d.where(pmod(col("doc_id"), lit(5)) =!= 0),
      d.where(pmod(col("doc_id"), lit(5)) === 0),
      Tables.scratchDir(spark, "cclabels", sfDir),
      Tables.scratchDir(spark, "ccsigs", sfDir))
  }

  /** Engine core of [[q155]], parameterized over the history/batch
    * split and store locations so the equivalence property (incremental
    * ≡ from-scratch) is also pinned in `Round8OperatorsSpec` on
    * synthetic bridge-merge data.
    */
  def ccIncremental(hist: DataFrame, batch: DataFrame,
                    labelStore: String, sigStore: String): DataFrame = {
    import graft.llm.TextDedup
    val spark = hist.sparkSession
    // base build — the state a previous run persisted
    val histPairs = TextDedup.jaccardNearDupPairs(
      hist, "doc_id", "text", n = 3, tNum = 3, tDen = 5)
    val histLabels = TextDedup.connectedComponents(histPairs, "d1", "d2")
    hist.select(col("doc_id"))
      .join(histLabels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .write.mode("overwrite").parquet(labelStore)
    TextDedup.writeSignatureStore(hist, "doc_id", "text", sigStore, n = 3)
    // incremental refresh — history arrives ONLY through the stores
    val stored = spark.read.parquet(labelStore)
    val sigs = spark.read.parquet(sigStore)
      .select(col("doc_id").as("dh"), col("hs").as("hs1"), col("sz").as("sz1"))
    val bsh = TextDedup.hashedShingles(batch, "doc_id", "text", 3)
      .select(col("doc_id").as("db"), col("hs").as("hs2"), col("sz").as("sz2"))
    val candHB = sigs.select(col("dh"), explode(col("hs1")).as("h"))
      .join(bsh.select(col("db"), explode(col("hs2")).as("h")), "h")
      .select(col("dh"), col("db")).distinct()
    val hbPairs = candHB.join(sigs, "dh").join(bsh, "db")
      .withColumn("inter", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jac",
        col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jac") >= lit(0.6))
      .select(col("dh").as("d1"), col("db").as("d2"))
    val bbPairs = TextDedup.jaccardNearDupPairs(
        batch, "doc_id", "text", n = 3, tNum = 3, tDen = 5)
      .select(col("d1"), col("d2"))
    val starEdges = stored.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("d1"), col("cluster_id").as("d2"))
    val merged = TextDedup.connectedComponents(
      starEdges.unionByName(hbPairs).unionByName(bbPairs), "d1", "d2")
    batch.select(col("doc_id"))
      .join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("kept", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  val q155Sql: String =
    // full-recompute ground truth over ALL documents (contracted —
    // [[contractedClosureSql]]), output restricted to the refresh batch
    s"""WITH RECURSIVE ${contractedClosureSql(3, 3, 5)}
       |SELECT doc_id, cluster_id, (doc_id = cluster_id) AS kept
       |FROM alldocs WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q156
  /** Content-defined chunking (CDC) dedup — the rsync/LBFS family:
    * chunk boundaries are placed where the [[PolyHash]] of the 8-char
    * window STARTING at a position is ≡ 0 (mod 64), so boundaries
    * depend only on local content. An insertion near a document's head
    * shifts every fixed-size block but leaves all content-defined
    * boundaries after it intact — which is why CDC chunk stores dedup
    * partially-edited files where whole-doc hashing (q27) and even
    * shingle Jaccard see two different documents. Output: per lang,
    * total vs distinct chunk counts and the dedup ratio a chunk store
    * would achieve.
    *
    * Scale design: chunking is one in-row O(len) rolling pass per
    * document ([[graft.functions.CdcChunkHashes]] — the declarative
    * `filter(sequence(...), i -> poly_hash(substring(...)))` form it
    * replaced re-hashed a fresh substring per position, O(len·w) and
    * 23 s at sf0.1 vs <1 s rolling; equivalence suite-pinned), with no
    * explode until the final distinct-count. The only shuffle is on
    * (lang, chunk_hash). At 100 TB the chunk-hash store replaces the
    * corpus at ~(1 − dup_ratio) of its bytes.
    */
  def q156(spark: SparkSession, sfDir: String): DataFrame = {
    val w = 8
    val mask = 64
    val chunked = docs(spark, sfDir)
      .withColumn("hashes", expr(s"cdc_chunk_hashes(text, $w, $mask)"))
      .select(col("lang"), col("hashes"))
    chunked
      .select(col("lang"), explode(col("hashes")).as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("h")).as("n_distinct"))
      .join(chunked.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs")), "lang")
      .select(col("lang"), col("n_docs"), col("n_chunks"), col("n_distinct"),
        round(lit(1) - col("n_distinct") / col("n_chunks").cast("double"), 6)
          .as("dup_ratio"))
      .orderBy(col("lang"))
  }

  val q156Sql: String = {
    val winHash = PolyHash.duckdbSql("(text[i:i+7])")
    val chunkHash = PolyHash.duckdbSql("ch")
    s"""WITH d AS (SELECT doc_id, lang, text, length(text) AS L FROM documents),
       |st AS (SELECT doc_id, lang, text, L,
       |  list_prepend(1, CASE WHEN L >= 9
       |    THEN [i for i in range(2, L - 8 + 2) if ($winHash) % 64 = 0]
       |    ELSE [] END) AS starts
       |  FROM d),
       |ch AS (SELECT doc_id, lang,
       |  list_transform(
       |    list_transform(starts, (s, j) ->
       |      CASE WHEN j = len(starts) THEN text[s:L]
       |           ELSE text[s:starts[j + 1] - 1] END),
       |    ch -> ($chunkHash)) AS hashes
       |  FROM st),
       |ex AS (SELECT lang, unnest(hashes) AS h FROM ch),
       |agg AS (SELECT lang, COUNT(*) AS n_chunks,
       |          CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct
       |        FROM ex GROUP BY lang),
       |nd AS (SELECT lang, COUNT(*) AS n_docs FROM ch GROUP BY lang)
       |SELECT lang, n_docs, n_chunks, n_distinct,
       |  ROUND(1 - n_distinct / CAST(n_chunks AS DOUBLE), 6) AS dup_ratio
       |FROM agg JOIN nd USING (lang) ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q60
  /** Containment near-dup pairs (near-superset detection): a short
    * document embedded in a longer one scores containment ≈ 1 while
    * its Jaccard vanishes — the boilerplate/quotation duplication case
    * q28 structurally cannot catch. Containment ≥ 9/10 over distinct
    * word 3-grams; d1 is the smaller side. The oracle generates
    * candidates with a plain shared-shingle join and verifies the
    * identical integer threshold, so the engine's asymmetric prefix
    * filter is proven lossless by the hash compare.
    *
    * The high threshold is also the scale contract: the candidate
    * join probes the smaller doc's `sz - ceil(t·sz) + 1` rarest
    * shingles (1–2 at t = 0.9) against the posting lists, so candidate
    * volume stays near-linear; low containment thresholds widen the
    * probed prefix toward all-postings quadratic and belong to the
    * Jaccard/LSH operators instead.
    */
  def q60(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .containmentNearDupPairs(docs(spark, sfDir), "doc_id", "text",
        n = 3, tNum = 9, tDen = 10)
      .select(col("d1"), col("d2"), round(col("containment"), 6).as("containment"))
      .orderBy(col("d1"), col("d2"))

  val q60Sql: String =
    // contracted ([[contractedShinglesSql]] — its symmetric `cand` is
    // unused here; the asymmetric smaller-side-first candidate join is
    // rebuilt on reps). Orientation expands per the operator's rule:
    // strict-size rep pairs keep (smaller, larger); size ties (and
    // intra-group pairs, containment exactly 1) order by doc_id.
    s"""WITH ${contractedShinglesSql(3)},
       |exz AS (SELECT doc_id, len(hs) AS sz, unnest(hs) AS h FROM hsh),
       |candz AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |          FROM exz a JOIN exz b ON a.h = b.h
       |          AND (a.sz < b.sz OR (a.sz = b.sz AND a.doc_id < b.doc_id))),
       |rj AS (SELECT d1, d2, inter, mn, sz1, sz2 FROM (
       |  SELECT d1, d2,
       |    len(list_intersect(x.hs, y.hs)) AS inter,
       |    LEAST(len(x.hs), len(y.hs)) AS mn,
       |    len(x.hs) AS sz1, len(y.hs) AS sz2
       |  FROM candz JOIN hsh x ON x.doc_id = d1 JOIN hsh y ON y.doc_id = d2)
       |  WHERE inter * 10 >= mn * 9),
       |inter_p AS (
       |  SELECT CASE WHEN rj.sz1 < rj.sz2 THEN a.doc_id
       |              ELSE LEAST(a.doc_id, b.doc_id) END AS d1,
       |         CASE WHEN rj.sz1 < rj.sz2 THEN b.doc_id
       |              ELSE GREATEST(a.doc_id, b.doc_id) END AS d2,
       |         rj.inter, rj.mn
       |  FROM rj JOIN mem a ON a.rep = rj.d1 JOIN mem b ON b.rep = rj.d2),
       |intra_p AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, 1 AS inter, 1 AS mn
       |  FROM grp g JOIN mem a ON a.rep = g.rep JOIN mem b ON b.rep = g.rep
       |  WHERE g.elig AND g.cnt >= 2 AND a.doc_id < b.doc_id)
       |SELECT d1, d2, ROUND(inter / CAST(mn AS DOUBLE), 6) AS containment
       |FROM (SELECT * FROM inter_p UNION ALL SELECT * FROM intra_p)
       |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Benchmark decontamination: corpus docs sharing any word 3-gram
    * with the benchmark set (here: every 97th doc stands in for an
    * eval set; the operator takes any two frames). The oracle builds
    * the identical shingle sets and join in DuckDB, so the broadcast
    * overlap plan is value-checked end to end.
    */
  def q73(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val bench = d.where(col("doc_id") % 97 === 0)
    val corpus = d.where(col("doc_id") % 97 =!= 0)
    graft.llm.TextDedup.contaminationOverlap(corpus, bench, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        round(col("contamination"), 6).as("contamination"), col("bench_id"))
      .orderBy(col("doc_id"))
  }

  val q73Sql: String =
    s"""WITH ${shinglesSql(3)},
       |hsh AS (SELECT doc_id,
       |          list_distinct(list_transform(shingles, s -> ${PolyHash.duckdbSql("s")})) AS hs
       |        FROM sh),
       |bset AS (SELECT h, MIN(bid) AS bench_id
       |         FROM (SELECT doc_id AS bid, unnest(hs) AS h FROM hsh WHERE doc_id % 97 = 0)
       |         GROUP BY h),
       |corp AS (SELECT doc_id, len(hs) AS sz, unnest(hs) AS h
       |         FROM hsh WHERE doc_id % 97 <> 0)
       |SELECT c.doc_id, c.sz AS n_shingles, COUNT(*) AS n_overlap,
       |  ROUND(COUNT(*) / CAST(c.sz AS DOUBLE), 6) AS contamination,
       |  MIN(b.bench_id) AS bench_id
       |FROM corp c JOIN bset b USING (h)
       |GROUP BY c.doc_id, c.sz ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Sorted-neighborhood near-dup pairs
    * ([[graft.llm.TextDedup.sortedNeighborhoodPairs]]): the SORT-based
    * blocking family next to the hash blockers (q28-q30) — each doc
    * compares only with its next 2 neighbors in (text, id) order, a
    * fixed 2n comparison budget with no bucket-skew risk. The oracle's
    * `row_number` global sort proves the distributed rank
    * ([[graft.operators.GlobalRank]]: range partition + local ranks +
    * offset prefix-sum, no single-partition window) assigns the
    * identical total order.
    */
  def q104(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .sortedNeighborhoodPairs(docs(spark, sfDir), "doc_id", "text",
        window = 3, minJaccard = 0.5)
      .orderBy(col("d1"), col("d2"))

  val q104Sql: String =
    // window-neighbor form: lead() hands each row its next two
    // neighbors off ONE global sort — the inequality self-join
    // (b.r - a.r BETWEEN 1 AND 2) it replaces forced a nested-loop
    // plan that blew past the oracle budget at sf1; token sets are
    // computed once per doc, not once per pair
    """WITH ranked AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS nn,
      |    lead(doc_id, 1) OVER w AS id1, lead(nn, 1) OVER w AS nn1,
      |    lead(doc_id, 2) OVER w AS id2, lead(nn, 2) OVER w AS nn2
      |  FROM documents WINDOW w AS (ORDER BY text, doc_id)),
      |j AS (
      |  SELECT doc_id AS d1, id1 AS d2, len(list_intersect(nn, nn1)) AS inter,
      |         len(nn) + len(nn1) AS tot
      |  FROM ranked WHERE id1 IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, id2, len(list_intersect(nn, nn2)), len(nn) + len(nn2)
      |  FROM ranked WHERE id2 IS NOT NULL)
      |SELECT d1, d2,
      |  ROUND(inter / CAST(tot - inter AS DOUBLE), 6) AS jaccard
      |FROM j WHERE inter / CAST(tot - inter AS DOUBLE) >= 0.5
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q106
  /** Fuzzy string matching by edit distance over sort-adjacent
    * candidates: the 20 closest consecutive part-name pairs in
    * lexicographic order, scored with full Levenshtein. The same
    * sorted-blocking shape as q104 ([[graft.operators.GlobalRank]] —
    * no single-partition window) with a character-level metric
    * instead of token Jaccard: n−1 distance computations total where
    * the all-pairs matcher needs n²/2. Distances are exact DP
    * integers — engine-identical.
    */
  def q106(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = graft.operators.GlobalRank
      .withGlobalRank(
        Tables.load(spark, sfDir, "part").select(col("p_partkey"), col("p_name")),
        Seq(col("p_name"), col("p_partkey")), "r")
    val nxt = ranked.select(col("p_partkey").as("p2"), col("p_name").as("n2"),
      (col("r") - 1).as("r"))
    ranked.join(nxt, "r")
      .select(col("p_partkey").as("p1"), col("p2"),
        levenshtein(col("p_name"), col("n2")).as("edit_dist"))
      .orderBy(col("edit_dist"), col("p1"))
      .limit(20)
  }

  val q106Sql: String =
    """WITH ranked AS (
      |  SELECT p_partkey, p_name,
      |    ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS r
      |  FROM part)
      |SELECT a.p_partkey AS p1, b.p_partkey AS p2,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
      |FROM ranked a JOIN ranked b ON b.r = a.r + 1
      |ORDER BY edit_dist, p1 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q109
  /** Incremental dedup-against-history: the production refresh shape.
    *
    * An 80% "history" slice of `documents` (doc_id % 10 < 8) has its
    * MinHash signature store persisted by a prior run
    * ([[graft.llm.TextDedup.writeSignatureStore]]); the 20% "new
    * batch" is then deduped against that store —
    * [[graft.llm.TextDedup.dedupAgainstStore]] computes signatures
    * ONLY for the batch and reads history back as (id, hs, sig) rows,
    * never rescanning history text. Same 12-hash / 4-band LSH
    * parameters as q29, so candidates are band matches across the
    * history/batch boundary with estimated + exact Jaccard.
    *
    * The oracle has no store, so it recomputes both sides from text —
    * which is exactly the equivalence that makes the store sound: the
    * persisted signatures must be indistinguishable from freshly
    * computed ones. `PipelineSpec` asserts the plan-level property the
    * oracle can't see (the history side is a parquet scan of the
    * store, with no text column anywhere in it).
    */
  def q109(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val store = graft.Tables.scratchDir(spark, "sigstore", sfDir)
    graft.llm.TextDedup.writeSignatureStore(
      d.where(col("doc_id") % 10 < 8), "doc_id", "text", store)
    graft.llm.TextDedup.dedupAgainstStore(
        d.where(col("doc_id") % 10 >= 8), "doc_id", "text", store)
      .select(col("d_hist"), col("d_new"),
        round(col("est_sim"), 6).as("est_sim"), round(col("jac"), 6).as("jac"))
      .orderBy(col("d_hist"), col("d_new"))
  }

  val q109Sql: String =
    s"""WITH ${shinglesSql(3)},
       |hsh AS (SELECT doc_id,
       |          list_distinct(list_transform(shingles, s -> ${PolyHash.duckdbSql("s")})) AS hs
       |        FROM sh),
       |hx AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
       |params AS (SELECT i, (i*7919 + 1) % $P AS a, (i*104729 + 12345) % $P AS b
       |           FROM range(0, 12) t(i)),
       |sig AS (SELECT doc_id, i, MIN((a*x + b) % $P) AS mh
       |        FROM hx CROSS JOIN params GROUP BY doc_id, i),
       |bandkey AS (SELECT doc_id, i // 3 AS band,
       |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |            FROM sig GROUP BY doc_id, i // 3),
       |cand AS (SELECT DISTINCT a.doc_id AS d_hist, b.doc_id AS d_new
       |         FROM bandkey a JOIN bandkey b
       |         ON a.band = b.band AND a.bkey = b.bkey
       |         WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8),
       |est AS (SELECT d_hist, d_new,
       |          SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / 12.0 AS est_sim
       |        FROM cand
       |        JOIN sig m1 ON m1.doc_id = d_hist
       |        JOIN sig m2 ON m2.doc_id = d_new AND m1.i = m2.i
       |        GROUP BY d_hist, d_new)
       |SELECT d_hist, d_new, ROUND(est_sim, 6) AS est_sim,
       |  ROUND(len(list_intersect(x.hs, y.hs)) /
       |        CAST(len(x.hs) + len(y.hs)
       |             - len(list_intersect(x.hs, y.hs)) AS DOUBLE), 6) AS jac
       |FROM est JOIN hsh x ON x.doc_id = d_hist JOIN hsh y ON y.doc_id = d_new
       |ORDER BY d_hist, d_new""".stripMargin

  // ---------------------------------------------------------------- q171
  /** STREAMING incremental near-dup — the q109/q122 refresh cycle
    * driven by an actual Structured Streaming `foreachBatch`
    * ([[graft.llm.TextDedup.dedupBatchAndMaintain]]), promoted from
    * suite-green (`StreamingSuite`) to oracle-green. The corpus
    * arrives as two file-source micro-batches (history slice
    * `doc_id % 4 != 0`, then the refresh slice — the file source
    * orders batches by file mtime, `maxFilesPerTrigger=1`, the
    * `sourceWithFlush` staging technique): each batch is deduped
    * against the signature store AND against itself, survivors'
    * signatures are appended idempotently (per-`batchId`
    * subdirectories — the store IS the stream's state, shared with
    * batch readers), and the duplicate pairs stream into a parquet
    * sink. The oracle replays both micro-batches' band arithmetic:
    * within-history pairs, history-SURVIVOR × refresh pairs (dup
    * history docs must NOT be matchable — they never entered the
    * store), and within-refresh pairs.
    *
    * Scale shape: per micro-batch only the batch's text is
    * signatured; history participates as stored signature rows;
    * pairs append to parquet (no driver-side state anywhere).
    */
  def q171(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val d = docs(spark, sfDir).select(col("doc_id"), col("text"))
    val base = graft.Tables.scratchDir(spark, "sigstream", sfDir)
    val stager = graft.streaming.FileStager(spark, base)
    val hfs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcDir = stager.srcDir
    val now = System.currentTimeMillis()
    stager.stage(d.where(col("doc_id") % 4 =!= 0), "batch1", now - 60000)
    stager.stage(d.where(col("doc_id") % 4 === 0), "batch2", now - 30000)
    val store = s"$base/store"
    val pairsDir = s"$base/pairs"
    val schema = StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val out = graft.llm.TextDedup
          .dedupBatchAndMaintain(batch, "doc_id", "text", store,
            batchId = Some(bid))
        // pairs sink is batchId-scoped like the signature store: a
        // replayed micro-batch whose subdirectory already committed
        // skips the write instead of double-appending its pairs
        val sub = s"$pairsDir/batch_$bid"
        val ok = new org.apache.hadoop.fs.Path(s"$sub/_SUCCESS")
        if (!ok.getFileSystem(batch.sparkSession.sparkContext
            .hadoopConfiguration).exists(ok))
          out.write.mode("overwrite").parquet(sub)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val pairs =
      if (hfs.exists(new org.apache.hadoop.fs.Path(pairsDir)))
        spark.read.option("recursiveFileLookup", "true").parquet(pairsDir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("d_hist", LongType), StructField("d_new", LongType),
          StructField("est_sim", org.apache.spark.sql.types.DoubleType),
          StructField("jac", org.apache.spark.sql.types.DoubleType))))
    pairs
      .select(col("d_hist"), col("d_new"),
        round(col("est_sim"), 6).as("est_sim"), round(col("jac"), 6).as("jac"))
      .orderBy(col("d_hist"), col("d_new"))
  }

  val q171Sql: String =
    s"""WITH ${shinglesSql(3)},
       |hsh AS (SELECT doc_id,
       |          list_distinct(list_transform(shingles, s -> ${PolyHash.duckdbSql("s")})) AS hs
       |        FROM sh),
       |hx AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
       |params AS (SELECT i, (i*7919 + 1) % $P AS a, (i*104729 + 12345) % $P AS b
       |           FROM range(0, 12) t(i)),
       |sig AS (SELECT doc_id, i, MIN((a*x + b) % $P) AS mh
       |        FROM hx CROSS JOIN params GROUP BY doc_id, i),
       |bandkey AS (SELECT doc_id, i // 3 AS band,
       |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |            FROM sig GROUP BY doc_id, i // 3),
       |c1 AS (SELECT DISTINCT a.doc_id AS d_hist, b.doc_id AS d_new
       |       FROM bandkey a JOIN bandkey b
       |       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |       WHERE a.doc_id % 4 <> 0 AND b.doc_id % 4 <> 0),
       |surv AS (SELECT doc_id FROM hsh
       |         WHERE doc_id % 4 <> 0
       |           AND doc_id NOT IN (SELECT d_new FROM c1)),
       |c2a AS (SELECT DISTINCT a.doc_id AS d_hist, b.doc_id AS d_new
       |        FROM bandkey a JOIN bandkey b
       |        ON a.band = b.band AND a.bkey = b.bkey
       |        WHERE a.doc_id IN (SELECT doc_id FROM surv)
       |          AND b.doc_id % 4 = 0),
       |c2b AS (SELECT DISTINCT a.doc_id AS d_hist, b.doc_id AS d_new
       |        FROM bandkey a JOIN bandkey b
       |        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |        WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 = 0),
       |allc AS (SELECT d_hist, d_new FROM c1
       |         UNION SELECT d_hist, d_new FROM c2a
       |         UNION SELECT d_hist, d_new FROM c2b),
       |est AS (SELECT d_hist, d_new,
       |          SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / 12.0 AS est_sim
       |        FROM allc
       |        JOIN sig m1 ON m1.doc_id = d_hist
       |        JOIN sig m2 ON m2.doc_id = d_new AND m1.i = m2.i
       |        GROUP BY d_hist, d_new)
       |SELECT d_hist, d_new, ROUND(est_sim, 6) AS est_sim,
       |  ROUND(len(list_intersect(x.hs, y.hs)) /
       |        CAST(len(x.hs) + len(y.hs)
       |             - len(list_intersect(x.hs, y.hs)) AS DOUBLE), 6) AS jac
       |FROM est JOIN hsh x ON x.doc_id = d_hist JOIN hsh y ON y.doc_id = d_new
       |ORDER BY d_hist, d_new""".stripMargin

  // ---------------------------------------------------------------- q113
  /** Exact incremental dedup against the persisted content-hash store
    * ([[graft.llm.TextDedup.writeHashStore]] /
    * [[graft.llm.TextDedup.exactDedupAgainstStore]]): same 80/20
    * history/batch split as q109, every batch doc classified as
    * dup-of-history / dup-in-batch / unique with its canonical id.
    * The oracle recomputes both sides from text; the engine reads
    * history back as (hash, keep_id) rows only.
    */
  def q113(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val store = graft.Tables.scratchDir(spark, "hashstore", sfDir)
    graft.llm.TextDedup.writeHashStore(
      d.where(col("doc_id") % 10 < 8), "doc_id", "text", store)
    graft.llm.TextDedup.exactDedupAgainstStore(
        d.where(col("doc_id") % 10 >= 8), "doc_id", "text", store)
      .orderBy(col("doc_id"))
  }

  val q113Sql: String =
    """WITH hist AS (
      |  SELECT sha256(text) AS text_sha, MIN(doc_id) AS keep_id
      |  FROM documents WHERE doc_id % 10 < 8 GROUP BY 1),
      |b AS (SELECT doc_id, sha256(text) AS text_sha FROM documents
      |      WHERE doc_id % 10 >= 8),
      |bm AS (SELECT text_sha, MIN(doc_id) AS batch_keep FROM b GROUP BY 1)
      |SELECT b.doc_id, b.text_sha,
      |  CASE WHEN h.keep_id IS NOT NULL THEN 'dup_of_history'
      |       WHEN b.doc_id <> bm.batch_keep THEN 'dup_in_batch'
      |       ELSE 'unique' END AS status,
      |  COALESCE(h.keep_id, bm.batch_keep) AS canonical_id
      |FROM b LEFT JOIN hist h ON b.text_sha = h.text_sha
      |JOIN bm ON b.text_sha = bm.text_sha
      |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------- q111
  /** Winnow-fingerprint overlap pairs — partial-duplication / quoted-
    * passage detection ([[graft.llm.TextDedup.winnowOverlapPairs]]):
    * an inverted index over the same k=8/w=16 winnowing selection as
    * q37, document-frequency-capped (stop-fingerprint removal, the
    * per-bucket skew bound), pairs sharing ≥ `MinShared` fingerprints
    * scored by shared count and overlap fraction vs the smaller set.
    * The oracle rebuilds the naive selection and the full index in
    * SQL — selection, df-cap, pair counts and fractions all
    * hash-checked.
    */
  private val WinnowMinShared = 3
  private val WinnowMaxDf = 10

  def q111(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup
      .winnowOverlapPairs(docs(spark, sfDir), "doc_id", "text",
        k = 8, w = 16, minShared = WinnowMinShared, maxDocFreq = WinnowMaxDf)
      .select(col("d1"), col("d2"), col("n_shared"),
        round(col("overlap"), 6).as("overlap"))
      .orderBy(col("d1"), col("d2"))

  val q111Sql: String = {
    val k = 8; val w = 16
    val ph = PolyHash
    s"""WITH kh AS (
       |  SELECT doc_id,
       |    [list_reduce(list_prepend(0::BIGINT, [unicode(c)::BIGINT for c in string_split(substring(text, i, $k), '')]), (acc, c) -> (acc * ${ph.Base} + c) % ${ph.Mod}) for i in range(1, length(text) - ${k - 2})] AS kh
       |  FROM documents WHERE length(text) >= ${k + w - 1}),
       |sel AS (
       |  SELECT doc_id,
       |    list_distinct([list_min(kh[i:i+${w - 1}]) for i in range(1, len(kh) - ${w - 2})]) AS sel
       |  FROM kh),
       |ex AS (SELECT doc_id, len(sel) AS n_sel, unnest(sel) AS fp FROM sel),
       |keep AS (SELECT fp FROM ex GROUP BY fp HAVING COUNT(*) <= $WinnowMaxDf),
       |fx AS (SELECT e.doc_id, e.n_sel, e.fp FROM ex e JOIN keep USING (fp)),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |        MIN(a.n_sel) AS n1, MIN(b.n_sel) AS n2,
       |        CAST(COUNT(*) AS BIGINT) AS n_shared
       |      FROM fx a JOIN fx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT d1, d2, n_shared,
       |  ROUND(n_shared / CAST(LEAST(n1, n2) AS DOUBLE), 6) AS overlap
       |FROM p WHERE n_shared >= $WinnowMinShared ORDER BY d1, d2""".stripMargin
  }

  // ---------------------------------------------------------------- q119
  /** Leakage-safe train/val/test split: assignment happens per
    * NEAR-DUP CLUSTER, never per document, so two near-duplicate
    * documents can never land in different splits — the dedup-aware
    * split discipline that keeps eval sets honest (a doc-level random
    * split leaks every duplicated document across the boundary).
    * Clusters come from the q54 machinery (PPJoin pairs → connected
    * components, singletons label themselves); the cluster label is
    * hashed multiplicatively to an 80/10/10 bucket. Output: per-split
    * doc and cluster counts plus an id checksum — membership itself is
    * hash-pinned.
    */
  def q119(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val pairs = graft.llm.TextDedup
      .jaccardNearDupPairs(d, "doc_id", "text", n = 3, tNum = 3, tDen = 5)
    val labels = graft.llm.TextDedup.connectedComponents(pairs, "d1", "d2")
    d.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("h", pmod(col("cluster_id") * 2654435761L, lit(1000L)))
      .withColumn("split",
        when(col("h") < 800, "train").when(col("h") < 900, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy(col("split"))
  }

  val q119Sql: String =
    // contracted closure ([[contractedClosureSql]]): alldocs carries
    // every document's cluster label (unclustered docs label
    // themselves), so the split hash/aggregation is unchanged
    s"""WITH RECURSIVE ${contractedClosureSql(3, 3, 5)},
       |s AS (SELECT doc_id, cluster_id,
       |  CASE WHEN (cluster_id * 2654435761) % 1000 < 800 THEN 'train'
       |       WHEN (cluster_id * 2654435761) % 1000 < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |  FROM alldocs)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
       |FROM s GROUP BY split ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q122
  /** q109's refresh, against the BUCKETED pre-banded signature store
    * ([[graft.llm.TextDedup.writeBandedSignatureStore]] /
    * [[dedupAgainstBandedStore]]): identical pairs — the oracle IS
    * q109's — but the history side is a catalog table bucketed on the
    * folded band key, so the refresh join reads history in bucket
    * order with NO exchange above its scan and shuffles only the new
    * batch (plan-asserted in `PipelineSpec`). This is the 100 TB
    * refresh asymmetry made physical: history's one-off bucketed
    * write amortizes across every subsequent batch.
    */
  def q122(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val table = ("graft_banded_sig_" +
      s"${spark.sparkContext.applicationId}_$sfDir")
      .replaceAll("[^A-Za-z0-9_]", "_")
    graft.llm.TextDedup.writeBandedSignatureStore(
      d.where(col("doc_id") % 10 < 8), "doc_id", "text", table)
    graft.llm.TextDedup.dedupAgainstBandedStore(
        d.where(col("doc_id") % 10 >= 8), "doc_id", "text", table)
      .select(col("d_hist"), col("d_new"),
        round(col("est_sim"), 6).as("est_sim"), round(col("jac"), 6).as("jac"))
      .orderBy(col("d_hist"), col("d_new"))
  }

  // ---------------------------------------------------------------- q123
  /** Exact repeated-substring spans
    * ([[graft.llm.TextDedup.repeatedSpans]], Lee et al. ACL 2022):
    * every maximal token span of ≥ 15 tokens whose every 15-token
    * window recurs somewhere in the corpus — the removal list the
    * suffix-array dedup pass would emit at this granularity. The
    * oracle rebuilds the identical windows with DuckDB list slicing,
    * recounts them corpus-wide, and re-merges the islands with the
    * same running-max break rule — window construction, duplicate
    * detection, and span merging are all hash-checked.
    */
  def q123(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup.repeatedSpans(docs(spark, sfDir), "doc_id", "text",
        minTokens = 15)
      .orderBy(col("doc_id"), col("span_start"))

  /** Shared repeated-span CTE chain (15-token windows): `isl` carries
    * every duplicated window tagged with its merge island — q123
    * reports the merged spans, q125 scrubs them from the corpus. */
  private val spanCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
      |grams AS (
      |  SELECT doc_id, CAST(s AS BIGINT) AS s,
      |    array_to_string(parts[s:s+14], ' ') AS g
      |  FROM toks, UNNEST(range(1, len(parts) - 15 + 2)) r(s)),
      |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
      |hits AS (
      |  SELECT doc_id, s, s + 14 AS e FROM grams JOIN dup USING (g)),
      |brk AS (
      |  SELECT doc_id, s, e,
      |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
      |      THEN 1 ELSE 0 END AS brk
      |  FROM hits),
      |isl AS (
      |  SELECT doc_id, s, e,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS isl
      |  FROM brk)""".stripMargin

  val q123Sql: String =
    s"""WITH $spanCtes
       |SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       |  MAX(e) - MIN(s) + 1 AS span_tokens
       |FROM isl GROUP BY doc_id, isl ORDER BY doc_id, span_start""".stripMargin

  // ---------------------------------------------------------------- q125
  /** Span scrub ([[graft.llm.TextDedup.scrubSpans]]): q123's
    * duplicated spans applied to the corpus — every covered token
    * removed, documents re-assembled from the survivors (the
    * conservative remove-all-occurrences policy; see the operator
    * scaladoc for why keep-one needs a different island shape). The
    * oracle re-derives the spans and rebuilds every document
    * token-by-token, so the scrub itself — not just the span list —
    * is hash-checked, clean text included.
    */
  def q125(spark: SparkSession, sfDir: String): DataFrame =
    graft.llm.TextDedup.scrubSpans(docs(spark, sfDir), "doc_id", "text",
        minTokens = 15)
      .orderBy(col("doc_id"))

  val q125Sql: String =
    s"""WITH $spanCtes,
       |spans AS (
       |  SELECT doc_id, MIN(s) AS ss, MAX(e) AS ee
       |  FROM isl GROUP BY doc_id, isl),
       |tok AS (
       |  SELECT doc_id, CAST(p AS BIGINT) AS p, parts[p] AS tokn
       |  FROM toks, UNNEST(range(1, len(parts) + 1)) r(p)),
       |kept AS (
       |  SELECT t.doc_id, t.p, t.tokn
       |  FROM tok t LEFT JOIN spans sp
       |    ON sp.doc_id = t.doc_id AND t.p BETWEEN sp.ss AND sp.ee
       |  WHERE sp.doc_id IS NULL),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_kept,
       |    COALESCE(string_agg(tokn, ' ' ORDER BY p), '') AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.parts) AS BIGINT) AS n_tokens,
       |  CAST(len(t.parts) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       |  COALESCE(a.clean_text, '') AS clean_text
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Pretraining-pipeline capstone: the full cleaning chain a
    * training-data user runs, composed from the library operators —
    * exact dedup ([[graft.llm.TextDedup.exactDuplicates]], min-id
    * survivors) → quality floor
    * ([[graft.llm.TextStats.withQualityScore]] at an explicit
    * non-default stopword list, score ≥ 0.5) → benchmark
    * decontamination ([[graft.llm.TextDedup.contaminationOverlap]]
    * against the raw doc_id%97 eval slice — eval sets arrive from
    * outside the cleaning pipe) → near-dup prune
    * ([[graft.llm.TextDedup.minHashLshPairs]], q29's parameters;
    * a doc is dropped when it pairs at jac ≥ 0.6 with ANY smaller-id
    * stage-3 survivor — the non-transitive pair rule; q54's
    * components are the transitive variant) → per-(lang, source)
    * survivor summary. The oracle replays every stage in one CTE
    * chain, so the *composition* — filters feeding joins feeding
    * filters — is hash-checked end to end, not just each operator in
    * isolation.
    *
    * Scale shape: each stage keeps its own operator's plan (hash-only
    * exact-dedup shuffle, in-row scoring, broadcast-sized bench set,
    * banded LSH join); the stages glue with id equi-joins/anti-joins
    * that AQE broadcasts as survivor sets shrink.
    */
  def q126(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val s1 = d.join(
      graft.llm.TextDedup.exactDuplicates(d, "doc_id", "text")
        .where(col("kept")).select("doc_id"),
      "doc_id")
    val s2 = graft.llm.TextStats
      .withQualityScore(s1, "text", Seq("a", "the"))
      .where(col("score") >= 0.5)
    val bench = d.where(col("doc_id") % 97 === 0)
    val corpus = s2.where(col("doc_id") % 97 =!= 0)
    val contaminated = graft.llm.TextDedup
      .contaminationOverlap(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").distinct()
    val s3 = corpus.join(contaminated, Seq("doc_id"), "left_anti")
    val removed = graft.llm.TextDedup
      .minHashLshPairs(s3, "doc_id", "text", n = 3, k = 12, bands = 4)
      .where(col("jac") >= 0.6)
      .select(col("d2").as("doc_id")).distinct()
    s3.join(removed, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_doc_ids"),
        sum(size(split(col("text"), " ")).cast("long")).as("sum_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  val q126Sql: String =
    s"""WITH ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |s1 AS (SELECT d.doc_id, d.lang, d.source,
       |         string_split(d.text, ' ') AS s
       |       FROM documents d JOIN ex USING (doc_id)),
       |s2 AS (SELECT doc_id, lang, source, s FROM s1
       |       WHERE LEAST(1.0, len(s) / 100.0) * 0.5
       |         + (len(list_filter(s, t -> list_contains(['a','the'], t)))
       |            / CAST(len(s) AS DOUBLE)) * 0.25
       |         + (1.0 - len(list_filter(s, t -> length(t) <= 2))
       |            / CAST(len(s) AS DOUBLE)) * 0.25 >= 0.5),
       |bhash AS (SELECT DISTINCT ${PolyHash.duckdbSql("g")} AS h FROM (
       |    SELECT unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |                   for i in range(1, len(s) - 1)]) AS g
       |    FROM (SELECT string_split(text, ' ') AS s FROM documents
       |          WHERE doc_id % 97 = 0)
       |    WHERE len(s) >= 3)),
       |hsh3 AS (SELECT doc_id, lang, source, s,
       |    list_distinct(list_transform(
       |      [s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |       for i in range(1, len(s) - 1)],
       |      g -> ${PolyHash.duckdbSql("g")})) AS hs
       |  FROM s2 WHERE doc_id % 97 <> 0),
       |contam AS (SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, unnest(hs) AS h FROM hsh3 WHERE len(s) >= 3) c
       |  JOIN bhash b USING (h)),
       |s3 AS (SELECT * FROM hsh3
       |       WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |hx AS (SELECT doc_id, unnest(hs) AS x FROM s3 WHERE len(s) >= 3),
       |params AS (SELECT i, (i*7919 + 1) % $P AS a, (i*104729 + 12345) % $P AS b
       |           FROM range(0, 12) t(i)),
       |sig AS (SELECT doc_id, i, MIN((a*x + b) % $P) AS mh
       |        FROM hx CROSS JOIN params GROUP BY doc_id, i),
       |bandkey AS (SELECT doc_id, i // 3 AS band,
       |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |            FROM sig GROUP BY doc_id, i // 3),
       |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |         FROM bandkey a JOIN bandkey b
       |         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |rem AS (SELECT DISTINCT d2 AS doc_id FROM (
       |    SELECT d1, d2,
       |      len(list_intersect(x.hs, y.hs)) /
       |      CAST(len(x.hs) + len(y.hs)
       |           - len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS jac
       |    FROM cand JOIN s3 x ON x.doc_id = d1 JOIN s3 y ON y.doc_id = d2)
       |  WHERE jac >= 0.6),
       |s4 AS (SELECT * FROM s3
       |       WHERE doc_id NOT IN (SELECT doc_id FROM rem))
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids,
       |  CAST(SUM(len(s)) AS BIGINT) AS sum_tokens
       |FROM s4 GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Precision/recall of the MinHash-LSH candidate tier (q29: 12
    * hashes, 4 bands × 3 rows) against the exact n-gram Jaccard ground
    * truth (q28 — lossless by its prefix-filter guarantee), swept over
    * τ ∈ {0.6, 0.7, 0.8} via
    * [[graft.llm.TextDedup.pairEvalByThreshold]]. A pair is predicted
    * when its signature-estimated similarity ≥ τ and true when its
    * exact Jaccard ≥ τ — the measured answer to "how many bands does
    * this corpus need", the dedup twin of q134's ANN recall.
    *
    * Scale shape: the two dedup pipelines dominate and keep their own
    * plans (banded equi-join, prefix-filtered join); the evaluation
    * adds one full-outer join of two candidate-pair lists and a
    * threshold-exploded conditional aggregation — pair-list-sized,
    * never corpus-sized.
    */
  def q135(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val truth = graft.llm.TextDedup
      .jaccardNearDupPairs(d, "doc_id", "text", n = 3, tNum = 3, tDen = 5)
    val pred = graft.llm.TextDedup
      .minHashLshPairs(d, "doc_id", "text", n = 3, k = 12, bands = 4)
    graft.llm.TextDedup.pairEvalByThreshold(pred, truth, Seq(0.6, 0.7, 0.8))
      .orderBy(col("threshold"))
  }

  val q135Sql: String =
    // contracted ([[contractedShinglesSql]]): est_sim and jac are pure
    // functions of the two texts, so the pred/truth pair universe
    // groups by text pair — each group-level full-outer row counts
    // with weight c1*c2, and intra-group pairs (identical signatures
    // share every band and every minhash: ps = ts = 1) contribute
    // C(c,2) true positives at every threshold arithmetically
    s"""WITH ${contractedShinglesSql(3)},
       |truthp AS (SELECT d1, d2, jac FROM (
       |    SELECT d1, d2,
       |      len(list_intersect(x.hs, y.hs)) /
       |      CAST(len(x.hs) + len(y.hs)
       |           - len(list_intersect(x.hs, y.hs)) AS DOUBLE) AS jac
       |    FROM cand JOIN hsh x ON x.doc_id = d1 JOIN hsh y ON y.doc_id = d2)
       |  WHERE jac >= 0.6),
       |hx AS (SELECT doc_id, unnest(hs) AS x FROM hsh),
       |params AS (SELECT i, (i*7919 + 1) % $P AS a, (i*104729 + 12345) % $P AS b
       |           FROM range(0, 12) t(i)),
       |sig AS (SELECT doc_id, i, MIN((a*x + b) % $P) AS mh
       |        FROM hx CROSS JOIN params GROUP BY doc_id, i),
       |bandkey AS (SELECT doc_id, i // 3 AS band,
       |              string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
       |            FROM sig GROUP BY doc_id, i // 3),
       |lcand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |          FROM bandkey a JOIN bandkey b
       |          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |predp AS (SELECT d1, d2,
       |            SUM(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / 12.0 AS est_sim
       |          FROM lcand
       |          JOIN sig m1 ON m1.doc_id = d1
       |          JOIN sig m2 ON m2.doc_id = d2 AND m1.i = m2.i
       |          GROUP BY d1, d2),
       |fo AS (
       |  SELECT COALESCE(p.est_sim, -1) AS ps, COALESCE(t.jac, -1) AS ts,
       |    ga.cnt * gb.cnt AS w
       |  FROM predp p FULL OUTER JOIN truthp t ON p.d1 = t.d1 AND p.d2 = t.d2
       |  JOIN grp ga ON ga.rep = COALESCE(p.d1, t.d1)
       |  JOIN grp gb ON gb.rep = COALESCE(p.d2, t.d2)
       |  UNION ALL
       |  SELECT 1.0::DOUBLE, 1.0::DOUBLE, cnt * (cnt - 1) // 2
       |  FROM grp WHERE elig AND cnt >= 2),
       |thr AS (SELECT CAST(unnest([0.6, 0.7, 0.8]) AS DOUBLE) AS threshold),
       |agg AS (SELECT threshold,
       |          CAST(SUM(CASE WHEN ps >= threshold AND ts >= threshold
       |                        THEN w ELSE 0 END) AS BIGINT) AS tp,
       |          CAST(SUM(CASE WHEN ps >= threshold AND ts < threshold
       |                        THEN w ELSE 0 END) AS BIGINT) AS fp,
       |          CAST(SUM(CASE WHEN ps < threshold AND ts >= threshold
       |                        THEN w ELSE 0 END) AS BIGINT) AS fn
       |        FROM fo CROSS JOIN thr GROUP BY threshold)
       |SELECT threshold, tp, fp, fn,
       |  ROUND(tp / NULLIF(tp + fp, 0), 6) AS prec,
       |  ROUND(tp / NULLIF(tp + fn, 0), 6) AS rec
       |FROM agg ORDER BY threshold""".stripMargin

  // ---------------------------------------------------------------- q176
  /** Entity resolution across two customer registries
    * ([[graft.operators.Linkage.blockedPairs]] + Fellegi–Sunter
    * integer log-odds scoring): a synthetic "dirty" registry is
    * derived in-query from `customer` by deterministic corruption
    * (one name digit substituted, nation drift, segment drift,
    * balance rounding — all pure integer arithmetic on the key, so
    * both engines derive the identical registry), then linked back
    * WITHOUT the key: two blocking passes (name suffix digits;
    * mid-digits + nation) generate candidates through equi-joins
    * only, and each candidate pair scores agreement per field — exact
    * name +24 / levenshtein ≤ 1 +16 / ≤ 2 +8 / else −8; nation +6/−3;
    * segment +4/−2; balance within 1.0 +5/−2 — classifying `match`
    * (≥ 30) and `possible` (≥ 15). The structured-record counterpart
    * of the text near-dup family; the multi-pass design means a
    * corruption that breaks one pass's key is still caught by the
    * other.
    *
    * Scale: no all-pairs anywhere — candidates are Σ_blocks |A|·|B|
    * with digit-bounded block cardinality; scoring is an in-row
    * integer sum (levenshtein on two 18-char strings); one distinct
    * over key pairs. All comparisons integer or exact-IEEE, so scores
    * are engine-identical.
    */
  def q176(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val dirty = c
      .withColumn("h1",
        pmod(col("c_custkey") * lit(1103515245L) + lit(12345L), lit(2147483648L)))
      .select(
        (col("c_custkey") + lit(1000000L)).as("b_key"),
        expr(
          """CASE WHEN h1 % 3 = 0 THEN
            |  concat(substr(c_name, 1, CAST(9 + (h1 % 9) AS INT)),
            |         CAST((h1 div 7) % 10 AS STRING),
            |         substr(c_name, CAST(11 + (h1 % 9) AS INT)))
            |ELSE c_name END""".stripMargin).as("b_name"),
        expr("CASE WHEN h1 % 7 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT) " +
          "ELSE c_nationkey END").as("b_nation"),
        expr("CASE WHEN h1 % 11 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END")
          .as("b_segment"),
        expr("CASE WHEN h1 % 5 = 0 THEN round(c_acctbal) ELSE c_acctbal END")
          .as("b_acctbal"))
    val cand = graft.operators.Linkage.blockedPairs(
      c, "c_custkey", dirty, "b_key",
      Seq(
        (substring(col("c_name"), 16, 3), substring(col("b_name"), 16, 3)),
        (concat_ws("|", substring(col("c_name"), 13, 3),
          col("c_nationkey").cast("string")),
          concat_ws("|", substring(col("b_name"), 13, 3),
            col("b_nation").cast("string")))))
    cand
      .join(c.select(col("c_custkey").as("a_key"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")), "a_key")
      .join(dirty, "b_key")
      .withColumn("score",
        when(col("c_name") === col("b_name"), 24)
          .when(levenshtein(col("c_name"), col("b_name")) <= 1, 16)
          .when(levenshtein(col("c_name"), col("b_name")) <= 2, 8)
          .otherwise(-8)
          + when(col("c_nationkey") === col("b_nation"), 6).otherwise(-3)
          + when(col("c_mktsegment") === col("b_segment"), 4).otherwise(-2)
          + when(abs(col("c_acctbal") - col("b_acctbal")) <= 1.0, 5).otherwise(-2))
      .where(col("score") >= 15)
      .select(col("a_key"), col("b_key"), col("score").cast("int").as("score"),
        when(col("score") >= 30, "match").otherwise("possible").as("decision"))
      .orderBy(col("a_key"), col("b_key"))
  }

  val q176Sql: String =
    """WITH dirty AS (
      |  SELECT c_custkey + 1000000 AS b_key,
      |    (c_custkey * 1103515245 + 12345) % 2147483648 AS h1,
      |    c_name, c_nationkey, c_mktsegment, c_acctbal
      |  FROM customer),
      |b AS (
      |  SELECT b_key,
      |    CASE WHEN h1 % 3 = 0 THEN
      |      substr(c_name, 1, CAST(9 + (h1 % 9) AS INT)) ||
      |      CAST((h1 // 7) % 10 AS VARCHAR) ||
      |      substr(c_name, CAST(11 + (h1 % 9) AS INT))
      |    ELSE c_name END AS b_name,
      |    CASE WHEN h1 % 7 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT)
      |         ELSE c_nationkey END AS b_nation,
      |    CASE WHEN h1 % 11 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END AS b_segment,
      |    CASE WHEN h1 % 5 = 0 THEN round(c_acctbal) ELSE c_acctbal END AS b_acctbal
      |  FROM dirty),
      |cand AS (
      |  SELECT a.c_custkey AS a_key, bb.b_key
      |  FROM customer a JOIN b bb
      |    ON substr(a.c_name, 16, 3) = substr(bb.b_name, 16, 3)
      |  UNION
      |  SELECT a.c_custkey, bb.b_key
      |  FROM customer a JOIN b bb
      |    ON substr(a.c_name, 13, 3) = substr(bb.b_name, 13, 3)
      |   AND a.c_nationkey = bb.b_nation),
      |sc AS (
      |  SELECT c.a_key, c.b_key,
      |    (CASE WHEN a.c_name = bb.b_name THEN 24
      |          WHEN levenshtein(a.c_name, bb.b_name) <= 1 THEN 16
      |          WHEN levenshtein(a.c_name, bb.b_name) <= 2 THEN 8 ELSE -8 END
      |     + CASE WHEN a.c_nationkey = bb.b_nation THEN 6 ELSE -3 END
      |     + CASE WHEN a.c_mktsegment = bb.b_segment THEN 4 ELSE -2 END
      |     + CASE WHEN abs(a.c_acctbal - bb.b_acctbal) <= 1.0 THEN 5 ELSE -2 END) AS score
      |  FROM cand c
      |  JOIN customer a ON a.c_custkey = c.a_key
      |  JOIN b bb ON bb.b_key = c.b_key)
      |SELECT a_key, b_key, CAST(score AS INT) AS score,
      |  CASE WHEN score >= 30 THEN 'match' ELSE 'possible' END AS decision
      |FROM sc WHERE score >= 15
      |ORDER BY a_key, b_key""".stripMargin

  // ---------------------------------------------------------------- q191
  /** Entity resolution under a HOT blocking key, guarded by
    * [[graft.operators.Linkage.blockedPairsCapped]]: the q176 pipeline
    * re-run with a realistic dirty-data hazard — 25% of records on
    * each side carry a MISSING primary blocking key (empty string,
    * the "default value" failure mode), so the uncapped first pass
    * would compare every missing-key record against every other
    * ((n/4)² pairs, quadratic in the corpus where every honest block
    * stays ~constant). The cap drops that one block — a block where a
    * quarter of the corpus agrees on the key carries no discriminating
    * power anyway — and the fallback pass (mid-name digits + nation)
    * still links the missing-key records, the multi-pass recall the
    * blocking design exists for. Per the no-silent-caps rule the
    * output carries the drop report: `dropped_blocks` and
    * `comparisons_avoided` (Σ n_a·n_b over dropped blocks) alongside
    * the per-decision pair counts.
    *
    * Scale: the guard costs two narrow per-pass count aggregations +
    * a broadcast anti-join; what it prevents grows quadratically. At
    * sf0.01 the hot block alone is ~140k comparisons avoided; at sf1
    * ~1.4e9 — the difference between a linking job that scales and
    * one that is quadratic in its dirtiest key.
    */
  def q191(spark: SparkSession, sfDir: String): DataFrame = {
    val c0 = Tables.load(spark, sfDir, "customer")
    val h1c = pmod(col("c_custkey") * lit(1103515245L) + lit(12345L),
      lit(2147483648L))
    val a = c0.withColumn("h1", h1c)
    val dirty = c0
      .withColumn("h1", h1c)
      .select(
        col("h1"),
        (col("c_custkey") + lit(1000000L)).as("b_key"),
        expr(
          """CASE WHEN h1 % 3 = 0 THEN
            |  concat(substr(c_name, 1, CAST(9 + (h1 % 9) AS INT)),
            |         CAST((h1 div 7) % 10 AS STRING),
            |         substr(c_name, CAST(11 + (h1 % 9) AS INT)))
            |ELSE c_name END""".stripMargin).as("b_name"),
        expr("CASE WHEN h1 % 7 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT) " +
          "ELSE c_nationkey END").as("b_nation"),
        expr("CASE WHEN h1 % 11 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END")
          .as("b_segment"),
        expr("CASE WHEN h1 % 5 = 0 THEN round(c_acctbal) ELSE c_acctbal END")
          .as("b_acctbal"))
    val (cand, dropped) = graft.operators.Linkage.blockedPairsCapped(
      a, "c_custkey", dirty, "b_key",
      Seq(
        // hot pass: last-4 name digits, MISSING (empty) for h1%4==0
        (when(col("h1") % 4 === 0, lit(""))
          .otherwise(substring(col("c_name"), 15, 4)),
          when(col("h1") % 4 === 0, lit(""))
            .otherwise(substring(col("b_name"), 15, 4))),
        // clean fallback pass: mid-name digits + nation (q176 pass 2)
        (concat_ws("|", substring(col("c_name"), 13, 3),
          col("c_nationkey").cast("string")),
          concat_ws("|", substring(col("b_name"), 13, 3),
            col("b_nation").cast("string")))),
      maxBlockPairs = 5000L)
    val scored = cand
      .join(c0.select(col("c_custkey").as("a_key"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"), col("c_acctbal")), "a_key")
      .join(dirty.drop("h1"), "b_key")
      .withColumn("score",
        when(col("c_name") === col("b_name"), 24)
          .when(levenshtein(col("c_name"), col("b_name")) <= 1, 16)
          .when(levenshtein(col("c_name"), col("b_name")) <= 2, 8)
          .otherwise(-8)
          + when(col("c_nationkey") === col("b_nation"), 6).otherwise(-3)
          + when(col("c_mktsegment") === col("b_segment"), 4).otherwise(-2)
          + when(abs(col("c_acctbal") - col("b_acctbal")) <= 1.0, 5).otherwise(-2))
      .where(col("score") >= 15)
      .select(col("a_key"),
        when(col("score") >= 30, "match").otherwise("possible").as("decision"))
    val drops = dropped.agg(
      count(lit(1)).as("dropped_blocks"),
      coalesce(sum(col("n_a") * col("n_b")), lit(0L)).as("comparisons_avoided"))
    scored.groupBy(col("decision"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a_key")).as("n_entities"))
      .crossJoin(broadcast(drops))
      .orderBy(col("decision"))
  }

  val q191Sql: String =
    """WITH src AS (
      |  SELECT c_custkey,
      |    (c_custkey * 1103515245 + 12345) % 2147483648 AS h1,
      |    c_name, c_nationkey, c_mktsegment, c_acctbal
      |  FROM customer),
      |b AS (
      |  SELECT h1, c_custkey + 1000000 AS b_key,
      |    CASE WHEN h1 % 3 = 0 THEN
      |      substr(c_name, 1, CAST(9 + (h1 % 9) AS INT)) ||
      |      CAST((h1 // 7) % 10 AS VARCHAR) ||
      |      substr(c_name, CAST(11 + (h1 % 9) AS INT))
      |    ELSE c_name END AS b_name,
      |    CASE WHEN h1 % 7 = 0 THEN CAST((c_nationkey + 1) % 25 AS INT)
      |         ELSE c_nationkey END AS b_nation,
      |    CASE WHEN h1 % 11 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END AS b_segment,
      |    CASE WHEN h1 % 5 = 0 THEN round(c_acctbal) ELSE c_acctbal END AS b_acctbal
      |  FROM src),
      |ak0 AS (SELECT c_custkey, CASE WHEN h1 % 4 = 0 THEN ''
      |          ELSE substr(c_name, 15, 4) END AS blk FROM src),
      |bk0 AS (SELECT b_key, CASE WHEN h1 % 4 = 0 THEN ''
      |          ELSE substr(b_name, 15, 4) END AS blk FROM b),
      |over0 AS (
      |  SELECT x.blk, x.n_a, y.n_b
      |  FROM (SELECT blk, COUNT(*) AS n_a FROM ak0 GROUP BY blk) x
      |  JOIN (SELECT blk, COUNT(*) AS n_b FROM bk0 GROUP BY blk) y USING (blk)
      |  WHERE x.n_a * y.n_b > 5000),
      |p0 AS (SELECT ak0.c_custkey AS a_key, bk0.b_key
      |       FROM ak0 JOIN bk0 USING (blk)
      |       WHERE blk NOT IN (SELECT blk FROM over0)),
      |ak1 AS (SELECT c_custkey, substr(c_name, 13, 3) || '|' ||
      |          CAST(c_nationkey AS VARCHAR) AS blk FROM src),
      |bk1 AS (SELECT b_key, substr(b_name, 13, 3) || '|' ||
      |          CAST(b_nation AS VARCHAR) AS blk FROM b),
      |over1 AS (
      |  SELECT x.blk, x.n_a, y.n_b
      |  FROM (SELECT blk, COUNT(*) AS n_a FROM ak1 GROUP BY blk) x
      |  JOIN (SELECT blk, COUNT(*) AS n_b FROM bk1 GROUP BY blk) y USING (blk)
      |  WHERE x.n_a * y.n_b > 5000),
      |p1 AS (SELECT ak1.c_custkey AS a_key, bk1.b_key
      |       FROM ak1 JOIN bk1 USING (blk)
      |       WHERE blk NOT IN (SELECT blk FROM over1)),
      |cand AS (SELECT a_key, b_key FROM p0 UNION SELECT a_key, b_key FROM p1),
      |sc AS (
      |  SELECT c.a_key,
      |    (CASE WHEN a.c_name = bb.b_name THEN 24
      |          WHEN levenshtein(a.c_name, bb.b_name) <= 1 THEN 16
      |          WHEN levenshtein(a.c_name, bb.b_name) <= 2 THEN 8 ELSE -8 END
      |     + CASE WHEN a.c_nationkey = bb.b_nation THEN 6 ELSE -3 END
      |     + CASE WHEN a.c_mktsegment = bb.b_segment THEN 4 ELSE -2 END
      |     + CASE WHEN abs(a.c_acctbal - bb.b_acctbal) <= 1.0 THEN 5 ELSE -2 END) AS score
      |  FROM cand c
      |  JOIN customer a ON a.c_custkey = c.a_key
      |  JOIN b bb ON bb.b_key = c.b_key),
      |drops AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS dropped_blocks,
      |         CAST(COALESCE(SUM(n_a * n_b), 0) AS BIGINT) AS comparisons_avoided
      |  FROM (SELECT n_a, n_b FROM over0 UNION ALL SELECT n_a, n_b FROM over1))
      |SELECT CASE WHEN score >= 30 THEN 'match' ELSE 'possible' END AS decision,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(COUNT(DISTINCT a_key) AS BIGINT) AS n_entities,
      |  dropped_blocks, comparisons_avoided
      |FROM sc CROSS JOIN drops
      |WHERE score >= 15
      |GROUP BY decision, dropped_blocks, comparisons_avoided
      |ORDER BY decision""".stripMargin

  // ---------------------------------------------------------------- q185
  /** Order-invariant exact dedup: documents are grouped by a
    * bag-of-words fingerprint — [[PolyHash]] over the SORTED token
    * multiset — so texts that are pure word-order shuffles of each
    * other (template re-renderings, shingle-order jitter from
    * scraping) collapse into one group where byte-exact dedup (q27)
    * sees distinct documents and Jaccard near-dup (q28) pays a
    * candidate join to find them. `n_orderings` counts the distinct
    * byte forms inside each group — exactly the documents q27 misses.
    *
    * Scale design: one in-row token sort per document (O(len·log len),
    * inside whole-stage codegen via `array_sort`+`array_join` feeding
    * the native `poly_hash`) and ONE shuffle on the 64-bit
    * fingerprint — the same hash-contraction shape as q27, no pair
    * join at any scale. The fingerprint is arithmetically portable,
    * so the oracle replays it bit-exactly (ASCII tokens sort
    * identically under Java UTF-16 and DuckDB byte order; the
    * documents corpus is ASCII by construction, TESTDATA.md).
    */
  def q185(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
      .withColumn("bow_hash",
        expr("poly_hash(array_join(array_sort(split(text, ' ')), ' '))"))
    val g = d.groupBy(col("bow_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"),
        countDistinct(col("text")).as("n_orderings"))
    d.join(g, "bow_hash")
      .select(col("doc_id"), col("bow_hash"), col("n_copies"),
        col("n_orderings"), (col("doc_id") === col("keep_id")).as("kept"))
      .orderBy(col("doc_id"))
  }

  val q185Sql: String = {
    val ph = PolyHash.duckdbSql("array_to_string(list_sort(string_split(text, ' ')), ' ')")
    s"""WITH h AS (SELECT doc_id, text, $ph AS bow_hash FROM documents),
       |g AS (SELECT bow_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id,
       |        COUNT(DISTINCT text) AS n_orderings
       |      FROM h GROUP BY bow_hash)
       |SELECT doc_id, h.bow_hash, n_copies, n_orderings,
       |  (doc_id = keep_id) AS kept
       |FROM h JOIN g USING (bow_hash) ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q190
  /** Right-to-be-forgotten store maintenance
    * ([[graft.llm.TextDedup.deleteFromStore]]): q109's refresh cycle
    * with a DELETION between build and serve — history builds the
    * signature store, a forget-set (`doc_id % 7 == 0`) is removed by
    * one anti-join + write-then-swap rewrite, and the refresh batch
    * dedups against what remains. The oracle replays q109 with
    * history := history minus the forget-set, which hash-checks the
    * structural guarantee that deleting per-document rows equals
    * rebuilding from the retained corpus: a forgotten document must
    * produce NO pair, and every retained pair must be untouched.
    */
  def q190(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val store = Tables.scratchDir(spark, "sigforget", sfDir)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)
    graft.llm.TextDedup.writeSignatureStore(
      d.where(col("doc_id") % 10 < 8), "doc_id", "text", store)
    graft.llm.TextDedup.deleteFromStore(spark, store,
      d.where(col("doc_id") % 10 < 8 && col("doc_id") % 7 === 0)
        .select(col("doc_id")), "doc_id")
    graft.llm.TextDedup.dedupAgainstStore(
        d.where(col("doc_id") % 10 >= 8), "doc_id", "text", store)
      .select(col("d_hist"), col("d_new"),
        round(col("est_sim"), 6).as("est_sim"), round(col("jac"), 6).as("jac"))
      .orderBy(col("d_hist"), col("d_new"))
  }

  // q109's oracle over the post-deletion history: forgotten docs may
  // appear on neither side of any pair
  val q190Sql: String =
    q109Sql.replace("WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8",
      "WHERE a.doc_id % 10 < 8 AND a.doc_id % 7 <> 0 AND b.doc_id % 10 >= 8")

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q27_exact_dedup", q27 _, Some(q27Sql)),
    ("q28_ngram_jaccard_neardup", q28 _, Some(q28Sql)),
    ("q29_minhash_lsh_neardup", q29 _, Some(q29Sql)),
    ("q30_simhash_neardup", q30 _, Some(q30Sql)),
    ("q54_neardup_clusters", q54 _, Some(q54Sql)),
    ("q60_containment_neardup", q60 _, Some(q60Sql)),
    ("q73_decontamination", q73 _, Some(q73Sql)),
    ("q104_snm_neardup", q104 _, Some(q104Sql)),
    ("q106_editdist_neighbors", q106 _, Some(q106Sql)),
    ("q109_dedup_against_history", q109 _, Some(q109Sql)),
    ("q171_stream_neardup_maintain", q171 _, Some(q171Sql)),
    ("q111_winnow_overlap", q111 _, Some(q111Sql)),
    ("q113_exact_dedup_incremental", q113 _, Some(q113Sql)),
    ("q119_leakage_safe_split", q119 _, Some(q119Sql)),
    ("q122_banded_store_dedup", q122 _, Some(q109Sql)),
    ("q123_repeated_spans", q123 _, Some(q123Sql)),
    ("q125_span_scrub", q125 _, Some(q125Sql)),
    ("q126_pipeline_capstone", q126 _, Some(q126Sql)),
    ("q135_lsh_eval", q135 _, Some(q135Sql)),
    ("q155_cc_incremental", q155 _, Some(q155Sql)),
    ("q156_cdc_chunk_dedup", q156 _, Some(q156Sql)),
    ("q176_entity_resolution", q176 _, Some(q176Sql)),
    ("q191_entity_resolution_capped", q191 _, Some(q191Sql)),
    ("q185_bow_fingerprint_dedup", q185 _, Some(q185Sql)),
    ("q190_store_forget", q190 _, Some(q190Sql))
  )
}
