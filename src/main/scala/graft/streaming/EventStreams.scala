package graft.streaming

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** State/output row of [[EventStreams.userRunningCounts]]. */
final case class UserCounts(user_id: Long, n_events: Long,
                            n_purchases: Long, n_batches: Long)

/** Structured Streaming over the `events` table.
  *
  * The transforms are plain `DataFrame => DataFrame` builders, shared
  * by three consumers:
  *  - the oracle-checked engine queries (parquet file source replayed
  *    with `Trigger.AvailableNow`, complete output into a memory sink
  *    — deterministic end-state, equal to the batch twin);
  *  - the `MemoryStream` test-suite, which drives append mode and
  *    asserts the *streaming-only* semantics: watermark advancement,
  *    window finalization, late-data drop;
  *  - batch DataFrames (the builders don't care — that twin-ness is
  *    the point of Structured Streaming).
  *
  * Scale design: every stateful op is keyed the way its batch twin
  * shuffles (window×type, user session), and every append-mode
  * pipeline carries a watermark so state is bounded — no
  * grow-forever aggregations (SURVEY §2.2 streaming row).
  */
object EventStreams {

  /** Streaming source over the driver-generated events parquet, same
    * timestamp-unit robustness as [[Tables.loadEvents]] (see
    * [[nativeSchema]]).
    *
    * The file source wants a *directory* it can watch for arriving
    * files; the test table is a single parquet file, so it is staged
    * into a temp directory — which is exactly the production shape
    * (files landing in a watched path).
    */
  // one staging dir per source table, shared by every query and trial
  // in the process (staging a fresh copy per call leaked a dataset
  // copy to /tmp per query per round); cleaned on JVM exit
  private val stagedSources =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private val rawEventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The file stream source requires an explicit schema, so the unit
    * robustness of [[Tables.loadEvents]] is reproduced by probing the
    * source file ONCE with a batch read: if Spark infers a native
    * timestamp (µs data; NTZ when isAdjustedToUTC=false), stream with
    * that inferred schema and cast to TimestampType (identity under the
    * UTC session TZ); otherwise fall back to the raw-int64 ns read.
    * Cached per file — one footer read per source per process.
    */
  private val probedSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, Option[StructType]]()

  private def nativeSchema(spark: SparkSession, src: String): Option[StructType] =
    probedSchemas.computeIfAbsent(src, { _ =>
      scala.util.Try(spark.read.parquet(src).schema).toOption.filter { s =>
        s("ts").dataType == TimestampType || s("ts").dataType == TimestampNTZType
      }
    })

  private def readEvents(spark: SparkSession, src: String, dir: String,
                         maxFilesPerTrigger: Option[Int]): DataFrame = {
    var reader = spark.readStream
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    nativeSchema(spark, src) match {
      case Some(s) =>
        reader.schema(s).parquet(dir)
          .withColumn("ts", col("ts").cast(TimestampType))
      case None =>
        val (d, m) = rawUnit(spark, src)
        reader.schema(rawEventSchema).parquet(dir)
          .withColumn("ts", timestamp_micros(expr(s"ts div $d * $m")))
    }
  }

  /** [[Tables.rawTsUnit]] probed against the batch view of the stream
    * source — the raw-long fallback never assumes an epoch unit. */
  private def rawUnit(spark: SparkSession, src: String): (Long, Long) =
    Tables.rawTsUnit(spark, src,
      spark.read.schema(rawEventSchema).parquet(src))

  def source(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.path(sfDir, "events")
    val dir = stagedSources.computeIfAbsent(src, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(src), d.resolve("events-000.parquet"))
      d.resolve("events-000.parquet").toFile.deleteOnExit()
      d.toFile.deleteOnExit()
      d
    })
    readEvents(spark, src, dir.toString, None)
  }

  /** [[source]] plus FLUSH SENTINEL files: far-future (-1)-user rows,
    * one per join side's event type. An outer stream-stream join only
    * emits its null-padded rows once the watermark passes the
    * buffered row's eviction bound — results near the stream's tail
    * would otherwise be withheld forever when the source drains. The
    * sentinel is the standard production drain pattern (an end-of-day
    * punctuation event): it advances BOTH sides' watermarks past
    * every real event. TWO sentinel files are staged and the source
    * reads one file per micro-batch, because the watermark computed
    * from a batch only drives eviction in a LATER batch and
    * `Trigger.AvailableNow` stops at the last data batch without a
    * trailing no-data batch (measured here: a single sentinel file
    * left exactly the post-pre-sentinel-watermark tail un-emitted).
    * Batch N processes sentinel #1 (eviction still at the real-data
    * watermark), batch N+1 processes sentinel #2 with the jumped
    * watermark and drains everything. Consumers filter the sentinel
    * key out (`user_id < 0`).
    */
  def sourceWithFlush(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.path(sfDir, "events")
    val dir = stagedSources.computeIfAbsent(src + "#flush", { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(src), d.resolve("events-000.parquet"))
      // mtimes strictly ordered AND strictly in the past: the file
      // source batches by modification time (a sentinel sorted before
      // the data would late-drop the whole stream), and a file with an
      // mtime at/after the stream's start can fall outside the
      // AvailableNow listing snapshot
      java.nio.file.Files.setLastModifiedTime(d.resolve("events-000.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000L))
      // sentinel: 2100-01-01, far past any synthetic event time —
      // written in the SAME unit/type as the probed source so the one
      // explicit stream schema reads every file in the directory
      import spark.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-flush-out")
      Seq(1, 2).foreach { k =>
        val sentinel = nativeSchema(spark, src) match {
          case Some(s) =>
            val t = java.time.LocalDateTime.of(2100, 1, 1, 0, 0)
            Seq((-(2L * k - 1), t, -1L, "click", 0.0, "{}"),
                (-(2L * k), t, -1L, "view", 0.0, "{}"))
              .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
              .withColumn("ts", col("ts").cast(s("ts").dataType))
          case None =>
            // 2100-01-01 epoch seconds, expressed in the source's own
            // probed raw unit (units/second = 1e6·d/m)
            val (dv, ml) = rawUnit(spark, src)
            val sentinelTs = 4102444800L * (1000000L * dv / ml)
            Seq((-(2L * k - 1), sentinelTs, -1L, "click", 0.0, "{}"),
                (-(2L * k), sentinelTs, -1L, "view", 0.0, "{}"))
              .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        }
        sentinel.coalesce(1).write.mode("overwrite").parquet(out.toString)
        val part = java.nio.file.Files.list(out)
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst.get
        val staged = d.resolve(s"events-00$k-flush.parquet")
        java.nio.file.Files.copy(part, staged)
        java.nio.file.Files.setLastModifiedTime(staged,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 60000L + 1000L * k))
        staged.toFile.deleteOnExit()
      }
      deleteRecursively(out)
      d.resolve("events-000.parquet").toFile.deleteOnExit()
      d.toFile.deleteOnExit()
      d
    })
    readEvents(spark, src, dir.toString, Some(1))
  }

  // --- transform builders (stream/batch agnostic) ----------------------

  /** Tumbling 1-day windows per event type. */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 6-hour windows every 3 hours. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("w_start"),
        col("event_type"), col("n"))

  /** Per-user session windows, 30-minute gap (ts truncated to seconds
    * so the batch oracle's gap arithmetic matches exactly).
    */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start_s"),
        col("session_window.end").cast("long").as("session_end_s"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup (first writer wins per key) then a daily count.
    *
    * State eviction requires the *watermarked event-time column
    * itself* in the dedup key set — a column merely derived from it
    * (the old `day` + watermark on raw `ts`) never expires, growing
    * state forever on an unbounded stream. So the event time IS the
    * day: `ts` truncated to day granularity carries the watermark
    * (25 h = the whole previous day plus an hour of lateness) and
    * doubles as the dedup day key; a day's dedup state drops as soon
    * as the watermark passes it. Day-level dedup semantics are
    * unchanged — duplicates share the truncated timestamp by
    * definition.
    */
  def dedupedDailyActors(events: DataFrame): DataFrame =
    events
      .withColumn("day_ts", date_trunc("day", col("ts")))
      .withWatermark("day_ts", "25 hours")
      .dropDuplicates("day_ts", "user_id", "event_type")
      .groupBy(col("day_ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_active_pairs"))

  /** Stream-stream interval self-join: each click matched to the same
    * user's views from the preceding 10 minutes. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * buffered join state is evictable (watermark + interval = how far
    * back a match can reach) — the requirements Spark imposes for
    * state cleanup on stream-stream joins, and the reason an
    * unbounded-interval join would grow state forever on a 100 TB/day
    * stream. Timestamps are pre-truncated to seconds so the batch
    * oracle's integer arithmetic matches exactly. Inner join → append
    * mode (each match emitted once, no rewrites).
    */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val sec = events.withColumn("ts", date_trunc("second", col("ts")))
    val clicks = sec.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val views = sec.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    clicks.join(views, expr(
      "c_user = v_user AND v_ts >= c_ts - interval 10 minutes AND v_ts <= c_ts"))
  }

  /** LEFT OUTER stream-stream interval join — [[clickViewJoin]]'s
    * condition with the genuinely different semantics: a click with
    * NO same-user view in its preceding 10 minutes still emits, with
    * null view columns, once the watermark proves no matching view
    * can arrive. Inner joins emit matches eagerly; outer rows exist
    * only through watermark-driven state eviction, which is why the
    * source must end with a flush sentinel ([[sourceWithFlush]]) for
    * a drained stream to equal the batch left join.
    *
    * The sentinel key must be filtered by the BATCH consumer, never
    * inside this streaming query: a `c_user >= 0` filter here is
    * pushed by the optimizer below the watermark into the clicks scan
    * — and, via the join equality, into the views scan — so the
    * sentinel rows vanish before the watermark operator ever sees
    * their event time and the flush never happens (measured: source
    * `numInputRows = 0` for the sentinel files, watermark pinned at
    * the real-data maximum).
    */
  def clickViewLeftJoin(events: DataFrame): DataFrame = {
    val sec = events.withColumn("ts", date_trunc("second", col("ts")))
    val clicks = sec.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val views = sec.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    clicks.join(views, expr(
        "c_user = v_user AND v_ts >= c_ts - interval 10 minutes AND v_ts <= c_ts"),
        "left_outer")
  }

  /** Stream-static enrichment join: each micro-batch of the stream is
    * joined to a static dimension table — the standard lookup/enrich
    * stage of a streaming pipeline. Stateless (no watermark or join
    * state: the static side is complete by definition), so it runs in
    * append mode with no state store at all.
    *
    * Scale shape: the dimension is pruned to the join key + requested
    * columns and BROADCAST, so each micro-batch is a map-side hash
    * probe — the stream is never shuffled. A huge dimension would
    * instead pre-shuffle both sides on the key; that variant is the
    * batch q05/q07 shape and needs no streaming-specific code.
    */
  def enrichJoin(events: DataFrame, dim: DataFrame, keyCol: String,
                 dimKey: String, dimCols: Seq[String]): DataFrame =
    events.join(
      broadcast(dim.select((col(dimKey).as(keyCol) +: dimCols.map(col)): _*)),
      Seq(keyCol))

  /** [[latestSnapshot]] with DELETE semantics — changelog compaction
    * with tombstones: the per-key argmax is unchanged, but a key
    * whose LATEST event is a `tombstoneType` is ABSENT from the
    * snapshot (the CDC delete rule; any later non-tombstone event
    * resurrects the key). Same bounded per-key state; the tombstone
    * filter is a stateless projection over the compacted aggregate,
    * one row per key — it costs nothing and can't be pushed anywhere
    * harmful (its column only exists above the aggregation).
    */
  def latestSnapshotWithTombstones(events: DataFrame,
                                   tombstoneType: String): DataFrame =
    latestSnapshot(events).where(col("event_type") =!= tombstoneType)

  /** Latest-state snapshot (streaming CDC/upsert materialization):
    * per user, the arg-max event under the total order
    * (second-truncated ts, event_id) — `max` over a struct compares
    * lexicographically, and event_id is unique, so the result is
    * independent of micro-batch boundaries and arrival order
    * (commutative + associative), which is what makes an upsert
    * stream deterministic. Truncation to seconds aligns the ordering
    * key with what both engines can compare exactly (the raw parquet
    * ts is ns; Spark holds µs). State: one struct per user — bounded
    * by key cardinality, the standard changelog-compaction footprint.
    */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max(struct(
        date_trunc("second", col("ts")).cast("long").as("ts_s"),
        col("event_id"), col("event_type"), col("value"))).as("last"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("last.ts_s").as("ts_s"),
        col("last.event_id").as("event_id"),
        col("last.event_type").as("event_type"),
        col("last.value").as("value"), col("n_events"))

  /** Custom stateful operator (`flatMapGroupsWithState`): per-user
    * running counters that survive across micro-batches — the escape
    * hatch for state machines the built-in windows can't express
    * (SURVEY §2.2 streaming row). Emits one updated row per user per
    * batch; state is explicit and bounded per key.
    */
  def userRunningCounts(events: DataFrame): Dataset[UserCounts] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserCounts, UserCounts](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[(Long, String)], state: GroupState[UserCounts]) =>
          val prev = state.getOption.getOrElse(UserCounts(user, 0L, 0L, 0L))
          var n = prev.n_events; var np = prev.n_purchases
          rows.foreach { case (_, typ) =>
            n += 1; if (typ == "purchase") np += 1
          }
          val next = UserCounts(user, n, np, prev.n_batches + 1)
          state.update(next)
          Iterator.single(next)
      }
  }

  // --- runner -----------------------------------------------------------

  /** Replays the file source to exhaustion (`Trigger.AvailableNow`)
    * into a memory sink in complete mode and returns the final table —
    * a real streaming execution with a deterministic, batch-equal
    * end state.
    *
    * TEST/ORACLE HARNESS ONLY: a complete-mode memory sink collects
    * the whole result to the driver. Production streaming writes go
    * through a distributed sink (the parquet streaming sink covered
    * by `SinksSpec`, or kafka/delta in a real deployment).
    */
  def runToTable(spark: SparkSession, streamed: DataFrame, name: String,
                 outputMode: String = "complete"): DataFrame = {
    val checkpoint = java.nio.file.Files.createTempDirectory(s"graft-ckpt-$name")
    // State-store sizing: a stateful operator materializes one state
    // store instance (snapshot + delta files per micro-batch) per
    // shuffle partition, and the count is pinned by the checkpoint at
    // first run. Unlike stateless shuffles, this is a deliberate
    // deployment decision scaled to STATE VOLUME, not core count —
    // 32 instances for kilobytes of state is pure commit overhead,
    // while a 100 TB stream raises it (SPARK_GRAFT_STREAM_PARTITIONS)
    // far above any core count. Scoped to this query's planning only;
    // the session conf is restored afterwards.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val statePartitions =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    val q = try {
      streamed.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", checkpoint.toString)
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    // the checkpoint has no value once the replay finished
    deleteRecursively(checkpoint)
    spark.table(name)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }
}
