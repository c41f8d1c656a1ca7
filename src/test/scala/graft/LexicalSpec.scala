package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.llm.Lexical.bm25MaxScorePruned]] ≡
  * [[graft.llm.Lexical.bm25Search]] — the MaxScore prune is lossless —
  * including the edge shapes the pruning argument leans on: seed term
  * matching fewer than k docs (pruning must disable itself), score
  * ties at the threshold (tie-break by id must survive the sieve),
  * and skew where most docs hold only low-upper-bound terms (the
  * corpus where the prune actually fires).
  */
class LexicalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private def assertSame(df: org.apache.spark.sql.DataFrame,
                         terms: Seq[String], k: Int): Unit = {
    import graft.llm.Lexical
    val full = Lexical.bm25Search(df, "doc_id", "text", terms, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val pruned = Lexical.bm25MaxScorePruned(df, "doc_id", "text", terms, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(pruned == full, s"terms=$terms k=$k")
  }

  test("pruned equals exhaustive on the documents corpus") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assertSame(d, Seq("spark", "vector", "customer"), 20)
    assertSame(d, Seq("slow"), 5)
    assertSame(d, Seq("the", "a", "join", "merge"), 10)
  }

  test("seed term under k matches: pruning disables itself") {
    val s = spark
    import s.implicits._
    // 'rare' appears in 2 docs (< k = 5) and carries the highest UB;
    // every other doc holds only 'common' — a naive θ from 2 seeds
    // would wrongly prune them
    val rows = (1L to 2L).map(i => (i, "rare common word")) ++
      (3L to 30L).map(i => (i, "common word word common"))
    assertSame(rows.toDF("doc_id", "text"), Seq("rare", "common"), 5)
  }

  test("ties at the threshold keep id tie-break intact") {
    val s = spark
    import s.implicits._
    // identical texts → identical scores at every rank; the sieve must
    // keep every tied doc so ORDER BY score DESC, id picks the same k
    val rows = (1L to 40L).map(i => (i, "alpha beta gamma"))
    assertSame(rows.toDF("doc_id", "text"), Seq("alpha", "gamma"), 7)
  }

  test("champion lists: proven-complete path equals exhaustive") {
    import graft.llm.Lexical
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm25champ").toString + "/store"
    Lexical.appendBm25Batch(d, "doc_id", "text", store)
    // m covering every posting: kept = dft for all terms, bound = 0 —
    // the completeness proof holds trivially and the served result
    // must be the exhaustive ranking
    Lexical.buildChampionLists(spark, store, "doc_id", m = 1000000)
    val terms = Seq("spark", "vector", "customer")
    val full = Lexical.bm25StoreSearch(spark, store, "doc_id", terms, 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val served = Lexical.championBm25Search(spark, store, "doc_id", terms, 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(served == full)
  }

  test("champion lists: tight m falls back and stays exact") {
    import graft.llm.Lexical
    val s = spark
    import s.implicits._
    // every doc shares both terms with near-identical impact, so a
    // 2-champion list cannot prove completeness for top-5 — the
    // fallback must fire and the answer must still be exhaustive
    val rows = (1L to 40L).map(i => (i, "alpha beta " + ("beta " * (i % 3).toInt).trim))
    val d = rows.toDF("doc_id", "text")
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm25champ_fb").toString + "/store"
    Lexical.appendBm25Batch(d, "doc_id", "text", store)
    Lexical.buildChampionLists(spark, store, "doc_id", m = 2)
    val terms = Seq("alpha", "beta")
    val full = Lexical.bm25StoreSearch(spark, store, "doc_id", terms, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val served = Lexical.championBm25Search(spark, store, "doc_id", terms, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(served == full)
  }

  test("skewed corpus where the prune fires") {
    val s = spark
    import s.implicits._
    // 5 docs hold the strong term; 500 hold only the weak stop-term
    // whose UB-sum cannot reach θ — result must still be exhaustive
    val rows = (1L to 5L).map(i => (i, "needle stop " + ("stop " * i.toInt).trim)) ++
      (6L to 505L).map(i => (i, "stop stop stop stop"))
    val df = rows.toDF("doc_id", "text")
    assertSame(df, Seq("needle", "stop"), 5)
    assertSame(df, Seq("needle", "stop"), 20)
  }
}
