package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[graft.operators.Linkage.blockedPairs]] (q176's candidate
  * generator): multi-pass recall — a corruption that breaks one pass's
  * blocking key is still caught by the other — and pair dedup across
  * passes.
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  test("multi-pass blocking catches single-key corruptions and dedups") {
    val a = Seq((1L, "ABC123"), (2L, "XYZ789")).toDF("id", "name")
    val b = Seq(
      (11L, "ABC124"), // suffix corrupted: pass1 (last 3) breaks, pass2 (first 3) catches
      (12L, "XYU789"), // prefix corrupted: pass2 breaks, pass1 catches
      (13L, "ABC123")  // clean: BOTH passes match — must appear once
    ).toDF("id", "name")
    val passes = Seq(
      (substring(col("name"), 4, 3), substring(col("name"), 4, 3)),
      (substring(col("name"), 1, 3), substring(col("name"), 1, 3)))
    val got = graft.operators.Linkage
      .blockedPairs(a, "id", b, "id", passes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((1L, 11L), (1L, 13L), (2L, 12L)))
  }
}
