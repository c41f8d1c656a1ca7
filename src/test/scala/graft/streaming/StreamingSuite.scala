package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double, props: String)

/** Streaming-only semantics that the oracle-checked AvailableNow
  * queries cannot show: watermark advancement, append-mode window
  * finalization, late-data drop, session merge/split, streaming dedup
  * (SURVEY §5.2 #7, FIXTURES.md "late-data tests").
  */
class StreamingSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "view",
                 value: Double = 1.0): Ev = Ev(id, ts(t), user, typ, value, "{}")

  private def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft-test-ckpt").toString

  test("watermark finalizes windows in append mode and drops late data") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dailyCounts(input.toDF)
      .writeStream.format("memory").queryName("wm_daily")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      // two day-1 events; a day-2 event pushes the watermark past day-1
      input.addData(
        ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 12:00:00"),
        ev(3, "2024-01-02 02:00:00"))
      q.processAllAvailable()
      // watermark is now 2024-01-02 01:00 (max - 1h) → day-1 finalized
      val afterFirst = s.table("wm_daily").collect()
      assert(afterFirst.map(r => (r.getDate(0).toString, r.getLong(2))).toSet ==
        Set(("2024-01-01", 2L)))

      // a LATE day-1 event (before the watermark) must be dropped;
      // a day-3 event closes day-2
      input.addData(
        ev(4, "2024-01-01 23:00:00"), // late: < watermark
        ev(5, "2024-01-03 06:00:00"))
      q.processAllAvailable()
      val rows = s.table("wm_daily").collect()
        .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01", "view", 2L)),
        "late event must not change the finalized day-1 window")
      assert(rows.contains(("2024-01-02", "view", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches inside the bound, not outside") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(input.toDF)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", typ = "view"),   // 5 min before → match
        ev(2, "2024-01-01 09:54:00", typ = "view"),   // 11 min before → no
        ev(3, "2024-01-01 10:06:00", typ = "click"),
        ev(4, "2024-01-01 10:05:00", typ = "view", user = 2L), // other user → no
        ev(5, "2024-01-01 10:07:00", typ = "view"))   // after the click → no
      q.processAllAvailable()
      val pairs = s.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getTimestamp(3).toString)).toSet
      assert(pairs == Set((1L, "2024-01-01 10:00:00.0")),
        s"exactly the in-interval same-user view must match, got $pairs")
    } finally q.stop()
  }

  test("left-outer join withholds orphans until the watermark proves no match") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.clickViewLeftJoin(input.toDF)
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", typ = "view"),            // matches click 2
        ev(2, "2024-01-01 10:06:00", typ = "click"),
        ev(3, "2024-01-01 10:06:00", typ = "click", user = 2L)) // no view: orphan
      q.processAllAvailable()
      val matched = s.table("ss_outer").where("v_ts IS NOT NULL").count()
      val orphans0 = s.table("ss_outer").where("v_ts IS NULL").count()
      assert(matched == 1L, "the in-interval match must emit eagerly")
      assert(orphans0 == 0L,
        "the orphan must be WITHHELD while a matching view could still arrive")
      // advance BOTH sides' watermarks past click 3 + interval + delay
      // (join eviction uses the min across inputs, so a view alone
      // moves nothing): each advance pair matches itself, adding no
      // orphan. Two batches — the watermark computed from one batch
      // drives eviction in the next.
      input.addData(
        ev(4, "2024-01-01 12:00:00", typ = "view", user = 99L),
        ev(5, "2024-01-01 12:00:00", typ = "click", user = 99L))
      q.processAllAvailable()
      input.addData(
        ev(6, "2024-01-01 12:00:01", typ = "view", user = 99L),
        ev(7, "2024-01-01 12:00:01", typ = "click", user = 99L))
      q.processAllAvailable()
      val orphanUsers = s.table("ss_outer").where("v_ts IS NULL")
        .collect().map(_.getLong(0)).toSet
      assert(orphanUsers == Set(2L),
        s"exactly the view-less click must surface null-padded, got $orphanUsers")
    } finally q.stop()
  }

  test("session windows merge events within the gap and split beyond it") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.sessionStats(input.toDF)
      .writeStream.format("memory").queryName("wm_sessions")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00"), // session A
        ev(2, "2024-01-01 10:10:00"), // merges: gap 10min < 30min
        ev(3, "2024-01-01 11:00:00"), // splits: gap 50min
        ev(4, "2024-01-01 10:20:00", user = 2L)) // separate key
      q.processAllAvailable()
      val rows = s.table("wm_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val t0 = ts("2024-01-01 10:00:00").getTime / 1000
      assert(rows == Set(
        (1L, t0, t0 + 600 + 1800, 2L),          // A: 10:00..10:10+gap
        (1L, t0 + 3600, t0 + 3600 + 1800, 1L),  // B: 11:00+gap
        (2L, t0 + 1200, t0 + 1200 + 1800, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: per-user state survives micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.userRunningCounts(input.toDF)
      .writeStream.format("memory").queryName("wm_state")
      .outputMode("update").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", user = 1L, typ = "view"),
        ev(2, "2024-01-01 10:01:00", user = 1L, typ = "purchase"),
        ev(3, "2024-01-01 10:02:00", user = 2L, typ = "view"))
      q.processAllAvailable()
      input.addData(
        ev(4, "2024-01-01 11:00:00", user = 1L, typ = "purchase"))
      q.processAllAvailable()
      // update mode appends one row per user per batch; latest per user wins
      val latest = s.table("wm_state").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._4) }
      assert(latest(1L) == ((1L, 3L, 2L, 2L))) // 3 events, 2 purchases, 2 batches
      assert(latest(2L) == ((2L, 1L, 0L, 1L)))
    } finally q.stop()
  }

  test("parquet streaming sink: append-mode windows land as files") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val input = MemoryStream[Ev]
    val q = EventStreams.dailyCounts(input.toDF)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt())
      .outputMode("append").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 12:00:00"),
        ev(3, "2024-01-02 02:00:00"), // advances watermark past day 1
        ev(4, "2024-01-03 06:00:00")) // finalizes day 2
      q.processAllAvailable()
      input.addData(ev(5, "2024-01-04 06:00:00"))
      q.processAllAvailable()
      val back = s.read.parquet(outDir)
      val rows = back.collect()
        .map(r => (r.getDate(0).toString, r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01", 2L)))
      assert(rows.contains(("2024-01-02", 1L)))
    } finally q.stop()
  }

  test("streaming dedup keeps the first record per key") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStreams.dedupedDailyActors(input.toDF)
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("complete").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", user = 1L, typ = "view"),
        ev(2, "2024-01-01 11:00:00", user = 1L, typ = "view"),   // dup pair
        ev(3, "2024-01-01 12:00:00", user = 1L, typ = "click"),
        ev(4, "2024-01-02 09:00:00", user = 1L, typ = "view"))   // new day
      q.processAllAvailable()
      val rows = s.table("wm_dedup").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1))).toSet
      assert(rows == Set(("2024-01-01", 2L), ("2024-01-02", 1L)))
    } finally q.stop()
  }

  test("streaming dedup maintains the signature store across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_stream").toString + "/store"
    val found = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF.toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val pairs = graft.llm.TextDedup
          .dedupBatchAndMaintain(batch, "doc_id", "text", store,
            batchId = Some(bid))
        found.synchronized {
          found ++= pairs.collect()
            .map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new")))
        }
        ()
      }
      .option("checkpointLocation", ckpt()).start()
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again"
      // batch 1: empty store → both docs survive and seed the store
      input.addData((1L, a),
        (2L, "completely unrelated first-batch document with many words"))
      q.processAllAvailable()
      assert(found.isEmpty, "first batch has no history to collide with")
      // batch 2: doc 11 duplicates doc 1 → pair; doc 12 is novel → appended
      input.addData((11L, a),
        (12L, "novel second-batch content that matches nothing prior"))
      q.processAllAvailable()
      assert(found.toSet == Set((1L, 11L)))
      // batch 3: doc 21 duplicates batch-2's SURVIVOR (12) — proof the
      // store was extended by the stream, not just the initial seed;
      // doc 11's duplicate content must still match hist=1, not 11
      // (dups were not appended)
      input.addData((21L, "novel second-batch content that matches nothing prior"))
      q.processAllAvailable()
      assert(found.toSet == Set((1L, 11L), (12L, 21L)))
      val storeIds = s.read.option("recursiveFileLookup", "true").parquet(store)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(storeIds == Seq(1L, 2L, 12L),
        "store = survivors only — duplicates (11, 21) must not be appended")
    } finally q.stop()
  }

  test("dedup store append is idempotent on micro-batch replay") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_replay").toString + "/store"
    def run(bid: Long, docs: (Long, String)*) = graft.llm.TextDedup
      .dedupBatchAndMaintain(docs.toDF("doc_id", "text"), "doc_id", "text",
        store, batchId = Some(bid))
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"))).toSet
    def storeRows() = s.read.option("recursiveFileLookup", "true").parquet(store)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val a = "the quick brown fox jumps over the lazy dog again and again"
    assert(run(0L, (1L, a)) == Set.empty)
    assert(run(1L, (2L, "totally different second-batch text here")) == Set.empty)
    val before = storeRows()
    assert(before == Seq(1L, 2L))
    // replay batch 1 (crash-recovery shape): pairs are re-derived
    // identically, but the committed batch_1 directory must NOT be
    // re-appended — store contents unchanged
    assert(run(1L, (2L, "totally different second-batch text here")) == Set.empty)
    assert(storeRows() == before, "replayed batch must not double-append")
    // and the replay still reports pairs against history correctly
    assert(run(2L, (3L, a)) == Set((1L, 3L)))
  }

  test("in-batch duplicates pair up and only the first survives") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_sigstore_inbatch").toString + "/store"
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val pairs = graft.llm.TextDedup
      .dedupBatchAndMaintain(
        Seq((5L, a), (7L, a), (9L, "unrelated content in the same batch"))
          .toDF("doc_id", "text"),
        "doc_id", "text", store, batchId = Some(0L))
      .collect().map(r => (r.getAs[Long]("d_hist"), r.getAs[Long]("d_new"))).toSet
    assert(pairs == Set((5L, 7L)), "same-batch duplicates must be reported")
    val storeIds = s.read.option("recursiveFileLookup", "true").parquet(store)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(storeIds == Seq(5L, 9L), "only the min-id twin enters the store")
  }

  test("stream-static enrich join is stateless and inner on the dim key") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val dim = Seq((1L, "AUTO"), (2L, "HOUSE")).toDF("k", "segment")
    val q = EventStreams.enrichJoin(input.toDF, dim, "user_id", "k", Seq("segment"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00", user = 1L))
      q.processAllAvailable()
      input.addData(
        ev(2, "2024-01-01 10:01:00", user = 2L),
        ev(3, "2024-01-01 10:02:00", user = 9L)) // no dim row → dropped
      q.processAllAvailable()
      val rows = s.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("segment"))).toSet
      assert(rows == Set((1L, "AUTO"), (2L, "HOUSE")))
      // stateless: no state store operators in the executed plan
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
