package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BM25 index store lifecycle ([[graft.llm.Lexical]]):
  * fragments accumulate per appended batch, compaction merges them
  * write-then-swap, and search results are IDENTICAL before and after
  * compaction — the same contract `compactSignatureStore` pins for
  * the near-dup store.
  */
class Bm25StoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private val sfDir = "/root/testdata/sf0.001"

  private def freshStore(tag: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft-bm25-$tag").toString
    new java.io.File(p).delete() // appendBm25Batch creates it
    p
  }

  test("append + compact preserves search results exactly; fragments merge") {
    import graft.llm.Lexical
    val d = Tables.load(spark, sfDir, "documents")
    val terms = Seq("spark", "vector", "customer")
    val store = freshStore("roundtrip")
    // three batches → three fragment sets
    Lexical.appendBm25Batch(d.where(pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", "text", store)
    Lexical.appendBm25Batch(d.where(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", store)
    Lexical.appendBm25Batch(d.where(pmod(col("doc_id"), lit(3)) === 2),
      "doc_id", "text", store)
    val statsFragsBefore = spark.read.parquet(s"$store/stats").count()
    assert(statsFragsBefore == 3, "expected one (nd, tt) fragment per batch")
    val dfFragsBefore = spark.read.parquet(s"$store/dfreq")
      .groupBy(col("tok")).count().agg(max(col("count"))).head().getLong(0)
    assert(dfFragsBefore > 1, "expected some term's df split across fragments")
    val before = Lexical.bm25StoreSearch(spark, store, "doc_id", terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    // full-corpus single-pass reference: the store must serve the same
    val direct = Lexical.bm25Search(d, "doc_id", "text", terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    assert(before == direct, "fragmented store diverged from direct search")

    Lexical.compactBm25Store(spark, store)
    assert(spark.read.parquet(s"$store/stats").count() == 1,
      "stats must compact to one row")
    val dfFragsAfter = spark.read.parquet(s"$store/dfreq")
      .groupBy(col("tok")).count().agg(max(col("count"))).head().getLong(0)
    assert(dfFragsAfter == 1, "dfreq must compact to one row per term")
    val after = Lexical.bm25StoreSearch(spark, store, "doc_id", terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "compaction changed search results")

    // post-compaction append keeps working (the q159 lifecycle)
    val store2 = freshStore("postappend")
    Lexical.appendBm25Batch(d.where(pmod(col("doc_id"), lit(3)) =!= 2),
      "doc_id", "text", store2)
    Lexical.compactBm25Store(spark, store2)
    Lexical.appendBm25Batch(d.where(pmod(col("doc_id"), lit(3)) === 2),
      "doc_id", "text", store2)
    val mixed = Lexical.bm25StoreSearch(spark, store2, "doc_id", terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    assert(mixed == direct, "compacted-then-appended store diverged")
  }

  test("compaction swap is crash-safe: no .compacting residue remains") {
    import graft.llm.Lexical
    val d = Tables.load(spark, sfDir, "documents").limit(50)
    val store = freshStore("swap")
    Lexical.appendBm25Batch(d, "doc_id", "text", store)
    Lexical.compactBm25Store(spark, store)
    val leftovers = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".compacting"))
    assert(leftovers.isEmpty, s"residual tmp dirs: ${leftovers.mkString(",")}")
    assert(new java.io.File(s"$store/postings").exists())
  }
}
