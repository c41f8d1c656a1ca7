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

  test("capped blocking equals uncapped when no block exceeds the budget") {
    val a = (1L to 20L).map(i => (i, f"N$i%03d-${i % 4}")).toDF("id", "name")
    val b = (21L to 40L).map(i => (i, f"N${i - 20}%03d-${(i - 20) % 4}"))
      .toDF("id", "name")
    val passes = Seq(
      (substring(col("name"), 1, 4), substring(col("name"), 1, 4)),
      (substring(col("name"), 6, 1), substring(col("name"), 6, 1)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = rows(graft.operators.Linkage
      .blockedPairs(a, "id", b, "id", passes))
    // largest block: the digit pass, 5 × 5 = 25 pairs — budget above it
    val (pairs, dropped) = graft.operators.Linkage
      .blockedPairsCapped(a, "id", b, "id", passes, maxBlockPairs = 25L)
    assert(rows(pairs) == uncapped)
    assert(dropped.count() == 0L)
  }

  test("oversized blocks are dropped AND reported; other passes keep their pairs") {
    // pass 1 key: a degenerate constant (every record agrees) — the
    // classic hot block; pass 2 key: well-distributed suffix
    val a = Seq((1L, "ABC1"), (2L, "XYZ2"), (3L, "QRS3")).toDF("id", "name")
    val b = Seq((11L, "ABC1"), (12L, "XYZ2"), (13L, "TUV9")).toDF("id", "name")
    val passes = Seq(
      (lit("K"), lit("K")),                        // 3 × 3 = 9 pairs, one block
      (substring(col("name"), 1, 3), substring(col("name"), 1, 3)))
    val (pairs, dropped) = graft.operators.Linkage
      .blockedPairsCapped(a, "id", b, "id", passes, maxBlockPairs = 4L)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // only pass 2's genuine prefix matches survive; the constant-key
    // cross product is gone
    assert(got === Seq((1L, 11L), (2L, 12L)))
    val rep = dropped.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq((0, "K", 3L, 3L)),
      "the dropped block must be reported with its pass and cardinalities")
  }
}
