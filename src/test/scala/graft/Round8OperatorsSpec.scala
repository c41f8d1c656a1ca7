package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-8 operators:
  *  - the rolling CDC chunker ([[graft.functions.CdcChunkHashes]])
  *    equals the declarative O(len·w) form it replaced, and has the
  *    defining CDC property (a prefix insertion leaves every chunk
  *    after the first original boundary intact);
  *  - incremental connected components ≡ from-scratch recompute on a
  *    synthetic chain that bridges two pre-existing clusters;
  *  - purged CV folds partition every event into exactly one of
  *    train/test/embargo per fold;
  *  - label-vote reliability weights fall as annotator error rises.
  */
class Round8OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val W = 8
  private val Mask = 64

  /** The declarative (pre-rolling) chunk-hash pipeline, kept here as
    * the executable specification of the boundary rule.
    */
  private def declarativeHashes(textCol: String) = {
    val starts =
      s"""concat(array(1),
         |  CASE WHEN length($textCol) >= $W + 1
         |       THEN filter(sequence(2, length($textCol) - $W + 1),
         |                   i -> poly_hash(substring($textCol, i, $W)) % $Mask = 0)
         |       ELSE array() END)""".stripMargin
    expr(
      s"""transform($starts, (s, j) ->
         |  poly_hash(substring($textCol, s,
         |    CASE WHEN j = size($starts) - 1 THEN length($textCol) - s + 1
         |         ELSE element_at($starts, j + 2) - s END)))""".stripMargin)
  }

  private def randomText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    (0 until len).map(_ => alpha(r.nextInt(alpha.length))).mkString
  }

  test("cdc_chunk_hashes: rolling pass equals the declarative form") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val texts = Seq("", "ab", "exactly8", "ninechars",
      randomText(1, 400), randomText(2, 900), randomText(3, 2000))
    val got = texts.toDF("text")
      .select(
        expr(s"cdc_chunk_hashes(text, $W, $Mask)").as("rolling"),
        declarativeHashes("text").as("declarative"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"rolling ${r.getSeq[Long](0)} != declarative ${r.getSeq[Long](1)}")
    }
  }

  test("cdc chunking: prefix insertion preserves chunks after the first boundary") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val base = randomText(7, 1500)
    val edited = "PREFIX-INSERTED " + base
    val Seq(h1, h2) = Seq(base, edited).toDF("text")
      .select(expr(s"cdc_chunk_hashes(text, $W, $Mask)"))
      .collect().toSeq.map(_.getSeq[Long](0))
    assert(h1.size >= 2, s"fixture text produced only ${h1.size} chunks")
    assert(h2.takeRight(h1.size - 1) == h1.drop(1),
      "chunks after the first content-defined boundary must survive a head edit")
  }

  test("ccIncremental ≡ full recompute when a batch chain bridges two old clusters") {
    import graft.llm.TextDedup
    // chain text k: 40 words starting at 8k — adjacent chain docs share
    // 32 consecutive words (30 of 38 word-3-grams, Jaccard ≈ 0.65 ≥ 0.6);
    // stride-2 apart drops to ≈ 0.41 < 0.6
    def chain(k: Int): String = (8 * k until 8 * k + 40).map(i => s"w$i").mkString(" ")
    val hist = Seq(
      (1L, chain(0)), (3L, chain(0)),      // cluster {1,3}, root 1
      (2L, chain(5)), (4L, chain(5)),      // cluster {2,4}, root 2
      (5L, (100 to 140).map(i => s"x$i").mkString(" "))) // singleton
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, chain(1)), (15L, chain(2)), (20L, chain(3)), (25L, chain(4)), // bridge
      (30L, (200 to 240).map(i => s"y$i").mkString(" ")))                 // new singleton
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ccinc").toString
    val inc = graft.queries.Dedup
      .ccIncremental(hist, batch, s"$tmp/labels", s"$tmp/sigs")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val fullPairs = TextDedup.jaccardNearDupPairs(
      hist.unionByName(batch), "doc_id", "text", n = 3, tNum = 3, tDen = 5)
    val fullLabels = TextDedup.connectedComponents(fullPairs, "d1", "d2")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val expected = Seq(10L, 15L, 20L, 25L, 30L)
      .map(id => id -> fullLabels.getOrElse(id, id)).toMap
    assert(inc == expected)
    // the chain must actually have merged the two old clusters
    assert(inc(10L) == 1L && inc(25L) == 1L,
      s"bridge chain should collapse both old clusters to root 1, got $inc")
    assert(inc(30L) == 30L)
  }

  test("q150: each fold partitions every event into train/test/embargo") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val total = Tables.load(spark, sfDir, "events").count()
    val folds = SparkEntry.queries("q150_purged_time_split")(spark, sfDir).collect()
    assert(folds.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
    folds.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == total,
        s"fold ${r.getInt(0)}: classes must partition all $total events")
      assert(r.getLong(2) > 0, "every fold must have test rows")
    }
  }

  test("q151: reliability weight decreases as annotator error rate rises") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val rows = SparkEntry.queries("q151_label_vote")(spark, sfDir).collect()
    assert(rows.length == 5)
    val w = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w(0) > w(4),
      s"10%-error annotator must out-agree the 50%-error one: $w")
    assert(w.values.forall(v => v > 0 && v <= n))
  }
}
