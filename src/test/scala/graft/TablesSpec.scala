package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins BOTH unit paths of `Tables.loadEvents` with tiny fixture files,
  * so a testdata-format drift (the round-7 regression: driver moved
  * `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the
  * loader kept dividing by 1000) can never again pass `sbt test` while
  * the oracle goes red.
  *
  *  - µs fixture: written here by Spark with TIMESTAMP_MICROS output —
  *    must round-trip values exactly through the native path.
  *  - ns fixture: committed under test resources with a true parquet
  *    TIMESTAMP(NANOS) logical type (Spark 4 refuses to infer it) —
  *    must arrive µs-truncated through the raw-int64 fallback.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  test("native path: TIMESTAMP(MICROS) events round-trip exactly") {
    val dir = Files.createTempDirectory("graft-events-us").toString
    val ts = Timestamp.valueOf("2024-03-05 12:34:56.654321")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      Seq((1L, ts, 7L, "view", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val got = Tables.load(spark, dir, "events").collect()
    assert(got.length == 1)
    assert(got(0).getTimestamp(1) == ts)
  }

  test("native path: TIMESTAMP_NTZ events cast to UTC instants") {
    val dir = Files.createTempDirectory("graft-events-ntz").toString
    // the driver's testdata is TIMESTAMP(MICROS) isAdjustedToUTC=false,
    // which Spark infers as TIMESTAMP_NTZ — model that exactly
    Seq((1L, java.time.LocalDateTime.parse("2024-03-05T12:34:56.654321"),
         7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events").collect()
    assert(got.length == 1)
    assert(got(0).getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-03-05T12:34:56.654321Z"))
  }

  test("fallback path: raw int64 ts in ns/µs/ms/s all infer their unit") {
    // the loader must never assume an epoch unit for a raw long ts —
    // magnitude probing (Tables.rawTsUnit) maps each to the same instant
    val instantUs = 1709642096654321L // 2024-03-05T12:34:56.654321Z
    val cases = Seq(
      ("ns", instantUs * 1000L, "2024-03-05T12:34:56.654321Z"),
      ("us", instantUs, "2024-03-05T12:34:56.654321Z"),
      ("ms", instantUs / 1000L, "2024-03-05T12:34:56.654Z"),
      ("s", instantUs / 1000000L, "2024-03-05T12:34:56Z"))
    cases.foreach { case (unit, rawTs, want) =>
      val dir = Files.createTempDirectory(s"graft-events-raw-$unit").toString
      Seq((1L, rawTs, 7L, "view", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Tables.load(spark, dir, "events").collect()
      assert(got.length == 1)
      assert(got(0).getTimestamp(1).toInstant == java.time.Instant.parse(want),
        s"unit $unit: got ${got(0).getTimestamp(1).toInstant}, want $want")
    }
  }

  test("fallback path: TIMESTAMP(NANOS) fixture arrives µs-truncated") {
    val dir = new java.io.File(
      getClass.getResource("/fixtures/events_ns").toURI).getAbsolutePath
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val agg = ev.agg(
      count(lit(1)).as("n"),
      countDistinct(to_date($"ts")).as("days"),
      min($"ts").as("mn")).collect()(0)
    assert(agg.getLong(0) == 5L)
    assert(agg.getLong(1) == 3L)
    // fixture row 1 is 2024-01-01T00:00:00.123456789Z → truncated to µs
    assert(agg.getTimestamp(2).toInstant ==
      java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))
  }
}

/** Real-testdata canary: reads the driver-generated events table through
  * the same `Tables.load` the whole query inventory uses and asserts
  * pinned invariants of the dataset itself (30 distinct days, Jan 2024,
  * non-empty). Round 7 proved the need: 228 synthetic-data tests stayed
  * green while all 23 events-touching oracle queries were red.
  */
class TestdataCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("sf0.001 events spans 30 distinct 2024 days through Tables.load") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(),
      "driver testdata not present")
    val agg = Tables.load(spark, sfDir, "events").agg(
      count(lit(1)).as("n"),
      countDistinct(to_date($"ts")).as("days"),
      year(min($"ts")).as("y_min"),
      year(max($"ts")).as("y_max")).collect()(0)
    assert(agg.getLong(0) > 0L)
    assert(agg.getLong(1) == 30L, "events must span 30 distinct days")
    assert(agg.getInt(2) == 2024 && agg.getInt(3) == 2024)
  }

  test("events.value stays inside q226/q227's [0, 512) bucket universe") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists(),
      "driver testdata not present")
    // qdBucket (queries/Events.scala) maps value via ⌊value·8⌋ into
    // [0, 4096) and SATURATES silently at the top bucket — a testdata
    // drift past 512 (or below 0, or to NULL) would skew every
    // quantile estimate without failing parity loudly. Pin it here.
    val agg = Tables.load(spark, sfDir, "events").agg(
      min($"value").as("mn"), max($"value").as("mx"),
      sum(when($"value".isNull, 1L).otherwise(0L)).as("n_null")).collect()(0)
    assert(agg.getLong(2) == 0L, "events.value must be non-null")
    assert(agg.getDouble(0) >= 0.0, "events.value must be >= 0")
    assert(agg.getDouble(1) < 512.0,
      s"events.value max ${agg.getDouble(1)} would saturate the q226 top bucket")
  }
}

/** Pins the scratch-store lifecycle: prior sessions' stale stores are
  * reclaimed on first `scratchDir` call; anything recently touched or
  * belonging to the live session survives.
  */
class ScratchCleanupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive

  private def mkStore(name: String, ageMs: Long): java.io.File = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    d.mkdirs()
    val f = new java.io.File(d, "part-00000.parquet")
    java.nio.file.Files.writeString(f.toPath, "x")
    val t = System.currentTimeMillis() - ageMs
    f.setLastModified(t); d.setLastModified(t)
    d
  }

  test("stale prior-session stores are removed; fresh and live ones kept") {
    val stale = mkStore("graft_teststore_app-dead-1_ds",
      Tables.scratchMaxAgeMs + 60000)
    val fresh = mkStore("graft_teststore_app-dead-2_ds", 60000)
    val live = mkStore(
      s"graft_teststore_${spark.sparkContext.applicationId}_ds",
      Tables.scratchMaxAgeMs + 60000) // even old: own appId is immune
    try {
      Tables.resetScratchCleanerForTest()
      Tables.scratchDir(spark, "probe", "/root/testdata/sf0.001")
      assert(!stale.exists(), "stale prior-session store must be reclaimed")
      assert(fresh.exists(), "recently-touched store must survive")
      assert(live.exists(), "live session's store must survive")
      // once per JVM: a second call must not rescan (recreate stale,
      // call again, expect it untouched)
      val stale2 = mkStore("graft_teststore_app-dead-3_ds",
        Tables.scratchMaxAgeMs + 60000)
      Tables.scratchDir(spark, "probe", "/root/testdata/sf0.001")
      assert(stale2.exists(), "cleaner must run once per JVM")
      stale2.listFiles().foreach(_.delete()); stale2.delete()
    } finally Seq(fresh, live).foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
  }
}
