package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's `session_window` gap-boundary semantics, which the q42
  * oracle must mirror: an event at EXACTLY the gap after the previous
  * one MERGES (merge condition is start ≤ previous end), so the
  * equivalent lag-based split predicate is `diff > gap`, not `>= gap`.
  * The sf0.1 corpus contains an exactly-1800 s pair; with the wrong
  * `>=` oracle the session counts differ by one — caught by the
  * round-8 sf0.1 parity sweep and locked in here.
  */
class SessionBoundaryProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private def sessions(ts: Seq[String]): Array[org.apache.spark.sql.Row] =
    ts.map(t => (java.sql.Timestamp.valueOf(t), 7L)).toDF("ts", "user_id")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").cast("long").as("s"),
        col("session_window.end").cast("long").as("e"), col("n"))
      .orderBy(col("s"))
      .collect()

  test("an event exactly gap seconds later merges into the session") {
    val out = sessions(Seq("2024-01-01 00:00:00", "2024-01-01 00:30:00"))
    assert(out.length == 1, s"exactly-gap pair must merge, got ${out.toSeq}")
    assert(out(0).getLong(2) == 2)
    // end = last event + gap
    assert(out(0).getLong(1) - out(0).getLong(0) == 3600L)
  }

  test("an event one second past the gap starts a new session") {
    val out = sessions(Seq("2024-01-01 00:00:00", "2024-01-01 00:30:01"))
    assert(out.length == 2, s"past-gap pair must split, got ${out.toSeq}")
  }
}
