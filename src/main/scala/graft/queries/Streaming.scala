package graft.queries

import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked Structured Streaming queries: the `events` parquet
  * replayed through a real streaming execution (file source →
  * watermarked stateful operators → memory sink, Trigger.AvailableNow)
  * whose deterministic end state equals a batch query the DuckDB
  * oracle can express. Watermark/late-data *behavioral* semantics are
  * asserted separately in the MemoryStream test suite (append mode).
  */
object Streaming {

  private def run(spark: SparkSession, sfDir: String, name: String,
                  f: DataFrame => DataFrame): DataFrame =
    EventStreams.runToTable(spark, f(EventStreams.source(spark, sfDir)), name)

  // ---------------------------------------------------------------- q40
  def q40(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_daily", EventStreams.dailyCounts)
      .orderBy(col("day"), col("event_type"))

  val q40Sql: String =
    s"""SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
       |  COUNT(*) AS n, ${graft.Num.dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------- q41
  def q41(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_sliding", EventStreams.slidingCounts)
      .orderBy(col("w_start"), col("event_type"))

  /** Each event belongs to exactly two 6h/3h sliding windows: the one
    * starting at its 3h slot and the previous one.
    */
  val q41Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 10800) AS BIGINT) * 10800 AS s0
      |  FROM events),
      |assigned AS (
      |  SELECT event_type, s0 AS w_start FROM e
      |  UNION ALL
      |  SELECT event_type, s0 - 10800 AS w_start FROM e)
      |SELECT w_start, event_type, COUNT(*) AS n
      |FROM assigned GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q42
  def q42(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_sessions", EventStreams.sessionStats)
      .orderBy(col("user_id"), col("session_start_s"))

  /** Session-window semantics: an event at EXACTLY gap seconds after
    * the previous one MERGES into the session — Spark's merge
    * condition is start ≤ previous end (empirically pinned in
    * `StreamingSuite`: two events 1800 s apart form ONE session
    * [t, t+3600); the sf0.1 corpus contains such a pair, which is how
    * the earlier `>= 1800` split here was caught). Hence `> 1800`
    * below — the same convention as the batch twin q25 — and
    * end = last+gap.
    */
  val q42Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, value,
       |    CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS ts_s
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, value, ts_s,
       |    CASE WHEN LAG(ts_s) OVER w IS NULL
       |         OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)),
       |sessions AS (
       |  SELECT user_id, value, ts_s,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged)
       |SELECT user_id, MIN(ts_s) AS session_start_s,
       |  MAX(ts_s) + 1800 AS session_end_s,
       |  COUNT(*) AS n_events, ${graft.Num.dsumSql("value")} AS sum_value
       |FROM sessions GROUP BY user_id, sid
       |ORDER BY user_id, session_start_s""".stripMargin

  // ---------------------------------------------------------------- q43
  def q43(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_dedup", EventStreams.dedupedDailyActors)
      .orderBy(col("day"))

  val q43Sql: String =
    """SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
      |  COUNT(DISTINCT (user_id, event_type)) AS n_active_pairs
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Stream-stream interval join ([[EventStreams.clickViewJoin]]):
    * clicks matched to same-user views within the prior 10 minutes,
    * executed as a real watermarked append-mode stream-stream join;
    * the per-user summary runs in batch over the streamed join
    * output. The oracle is the equivalent batch interval join at
    * second precision.
    */
  def q69(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.runToTable(spark,
        EventStreams.clickViewJoin(EventStreams.source(spark, sfDir)),
        "stream_click_view", outputMode = "append")
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("c_ts").cast("long") - col("v_ts").cast("long")).as("max_gap_s"))
      .orderBy(col("user_id"))

  val q69Sql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS c_s
      |  FROM events WHERE event_type = 'click'),
      |v AS (
      |  SELECT user_id, CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS v_s
      |  FROM events WHERE event_type = 'view')
      |SELECT c.user_id AS user_id, COUNT(*) AS n_pairs,
      |  CAST(MAX(c_s - v_s) AS BIGINT) AS max_gap_s
      |FROM c JOIN v ON c.user_id = v.user_id
      |  AND v_s >= c_s - 600 AND v_s <= c_s
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Stream-static enrichment join ([[EventStreams.enrichJoin]]):
    * the events stream joined per micro-batch to the static customer
    * dimension (user_id = c_custkey, broadcast), then summarized by
    * market segment in batch over the streamed join output. Stateless
    * append mode — the streaming counterpart of the batch broadcast
    * joins q05/q07.
    */
  def q76(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.runToTable(spark,
        EventStreams.enrichJoin(EventStreams.source(spark, sfDir),
          graft.Tables.load(spark, sfDir, "customer"),
          "user_id", "c_custkey", Seq("c_mktsegment")),
        "stream_enriched", outputMode = "append")
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Num.dsum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))

  val q76Sql: String =
    s"""SELECT c_mktsegment, event_type, COUNT(*) AS n,
       |  ${graft.Num.dsumSql("value")} AS sum_value
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY c_mktsegment, event_type
       |ORDER BY c_mktsegment, event_type""".stripMargin

  // ---------------------------------------------------------------- q84
  /** Streaming latest-state snapshot ([[EventStreams.latestSnapshot]]):
    * the changelog-compaction / CDC-upsert pattern — per user, the
    * arg-max event under (second-truncated ts, event_id), maintained
    * as a streaming aggregate whose result is provably independent of
    * micro-batch slicing. The oracle is the batch window argmax.
    */
  def q84(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_snapshot", EventStreams.latestSnapshot)
      .orderBy(col("user_id"))

  val q84Sql: String =
    """WITH r AS (
      |  SELECT user_id,
      |    CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS ts_s,
      |    event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY DATE_TRUNC('second', ts) DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, ts_s, event_id, event_type, value, n_events
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q131
  /** Tombstoned snapshot
    * ([[EventStreams.latestSnapshotWithTombstones]]): q84's
    * changelog compaction with the CDC DELETE rule — a user whose
    * latest event is an `error` is absent from the snapshot; any
    * later non-error event resurrects the key. The oracle applies
    * the same last-event-wins-then-tombstone filter to the batch
    * window argmax.
    */
  def q131(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, "stream_tombstone_snapshot",
        ev => EventStreams.latestSnapshotWithTombstones(ev, "error"))
      .orderBy(col("user_id"))

  val q131Sql: String =
    """WITH r AS (
      |  SELECT user_id,
      |    CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS ts_s,
      |    event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY DATE_TRUNC('second', ts) DESC, event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, ts_s, event_id, event_type, value, n_events
      |FROM r WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q129
  /** LEFT OUTER stream-stream interval join
    * ([[EventStreams.clickViewLeftJoin]]): q69's condition with the
    * semantics only watermarks can provide — clicks with NO view in
    * their preceding 10 minutes emit null-padded once the watermark
    * proves no match can arrive. The source ends with a flush
    * sentinel ([[EventStreams.sourceWithFlush]]) so the drained
    * stream equals the batch left join the oracle runs; the per-user
    * summary counts matched rows and orphaned clicks.
    */
  def q129(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.runToTable(spark,
        EventStreams.clickViewLeftJoin(
          EventStreams.sourceWithFlush(spark, sfDir)),
        "stream_click_view_outer", outputMode = "append")
      .filter(col("c_user") >= 0) // drop the flush sentinel (batch side —
      // see clickViewLeftJoin's scaladoc for why it must not be upstream)
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("v_ts")).as("n_matched"),
        sum(when(col("v_ts").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .orderBy(col("user_id"))

  val q129Sql: String =
    """WITH c AS (
      |  SELECT user_id, CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS c_s
      |  FROM events WHERE event_type = 'click'),
      |v AS (
      |  SELECT user_id, CAST(epoch(DATE_TRUNC('second', ts)) AS BIGINT) AS v_s
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT c.user_id, v.v_s FROM c LEFT JOIN v
      |  ON c.user_id = v.user_id AND v.v_s >= c.c_s - 600 AND v.v_s <= c.c_s)
      |SELECT user_id, COUNT(*) AS n_rows, COUNT(v_s) AS n_matched,
      |  CAST(SUM(CASE WHEN v_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q40_stream_daily_window", q40 _, Some(q40Sql)),
    ("q41_stream_sliding_window", q41 _, Some(q41Sql)),
    ("q42_stream_session_window", q42 _, Some(q42Sql)),
    ("q43_stream_dedup_daily", q43 _, Some(q43Sql)),
    ("q69_stream_stream_join", q69 _, Some(q69Sql)),
    ("q76_stream_static_join", q76 _, Some(q76Sql)),
    ("q84_stream_upsert_snapshot", q84 _, Some(q84Sql)),
    ("q129_stream_outer_join", q129 _, Some(q129Sql)),
    ("q131_tombstone_snapshot", q131 _, Some(q131Sql))
  )
}
