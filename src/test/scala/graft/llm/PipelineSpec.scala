package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The operators composed as one training-data cleaning pipeline:
  * language-ID → quality gate → reproducible sample → near-dup
  * clustering → survivor fingerprints. Asserts stage-by-stage
  * cardinality behavior and full-pipeline determinism.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")

  private def runPipeline() = {
    val enriched = TextStats.withSampleBucket(
      TextStats.withQualityScore(
        TextStats.withPredictedLanguage(docs, "text",
          Seq("de" -> Seq("der", "die", "das"), "en" -> Seq("the", "a", "of"))),
        "text", Seq("the", "a", "of", "der", "die")),
      "text", buckets = 100)
    val gated = enriched.where(col("score") >= 0.4 && col("sample_bucket") < 80)
    val pairs = TextDedup.jaccardNearDupPairs(gated, "doc_id", "text")
    val clusters = TextDedup.connectedComponents(pairs, "d1", "d2")
    val survivors = gated.join(
      clusters.where(col("doc_id") =!= col("cluster_id")), Seq("doc_id"), "left_anti")
    val fingerprinted = TextStats.withWinnowStats(survivors, "text")
    (enriched, gated, survivors, fingerprinted)
  }

  test("stages gate monotonically and keep one survivor per dup cluster") {
    val (enriched, gated, survivors, fingerprinted) = runPipeline()
    val nAll = enriched.count()
    val nGated = gated.count()
    val nSurvivors = survivors.count()
    assert(nAll == 500)
    assert(nGated < nAll && nGated > 0, s"quality+sample gate kept $nGated")
    assert(nSurvivors <= nGated)
    assert(fingerprinted.count() <= nSurvivors) // too-short docs drop
    // every enrichment column made it through
    assert(Seq("predicted", "score", "sample_bucket", "ws")
      .forall(fingerprinted.columns.contains))
    // no near-dup pair survives intact among survivors
    val leftoverPairs = TextDedup.jaccardNearDupPairs(survivors, "doc_id", "text").count()
    assert(leftoverPairs == 0, s"$leftoverPairs near-dup pairs survived dedup")
  }

  test("the full pipeline is deterministic run-to-run") {
    val a = runPipeline()._4.select("doc_id", "ws.checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = runPipeline()._4.select("doc_id", "ws.checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
