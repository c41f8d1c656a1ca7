package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Count-Min sketch ([[graft.operators.CountMin]]):
  * linearity (the property that makes it mergeable), the one-sided
  * error guarantee, and exactness in a collision-free grid.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  /** Skewed synthetic terms across 3 groups: term t_i appears ~i×. */
  private def corpus = (1 to 40).flatMap { i =>
    (0 until i).map(j => (s"t$i", s"g${j % 3}"))
  }.toDF("term", "grp")

  private def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    df.select(col("r").cast("int"), col("b").cast("long"), col("c").cast("long"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap

  test("linearity: merged per-group sketches equal the one-shot global grid") {
    val d = 4; val w = 32
    val perGroup = CountMin.sketch(corpus, "term", d, w, Seq("grp"))
    val merged = cells(CountMin.merge(perGroup))
    val global = cells(CountMin.sketch(corpus, "term", d, w))
    assert(merged == global,
      "cell-wise addition of partials must equal the direct build")
  }

  test("estimates never undercount, and a collision-free grid is exact") {
    val d = 4; val w = 32
    val grid = CountMin.merge(CountMin.sketch(corpus, "term", d, w))
    val est = CountMin.estimates(grid, corpus.select("term"), "term", d, w)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = corpus.groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet, "every observed term gets an estimate")
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS undercounted $t: ${est(t)} < $n")
    }
    // a wide grid over few terms: whichever row happens to be
    // collision-free for a term gives est == exact via the MIN
    val wide = 4096
    val grid2 = CountMin.merge(CountMin.sketch(corpus, "term", 6, wide))
    val est2 = CountMin.estimates(grid2, corpus.select("term"), "term", 6, wide)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exactHits = exact.count { case (t, n) => est2(t) == n }
    assert(exactHits == exact.size,
      s"at w=$wide every term should estimate exactly; $exactHits/${exact.size} did")
  }

  test("grid store: batchId append is replay-idempotent; compaction " +
    "preserves the merged grid") {
    val d = 3; val w = 16
    val store = java.nio.file.Files.createTempDirectory("cmsstore").toString
    val b1 = corpus.where(col("grp") === "g0")
    val b2 = corpus.where(col("grp") =!= "g0")
    CountMin.appendBatchGrid(b1, "term", d, w, store, batchId = Some(0L))
    CountMin.appendBatchGrid(b2, "term", d, w, store, batchId = Some(1L))
    val merged = cells(CountMin.readMergedGrid(spark, store))
    assert(merged == cells(CountMin.sketch(corpus, "term", d, w)),
      "streamed partials must sum to the global grid")
    // a replayed batch whose _SUCCESS committed must not double-count
    CountMin.appendBatchGrid(b2, "term", d, w, store, batchId = Some(1L))
    assert(cells(CountMin.readMergedGrid(spark, store)) == merged,
      "replayed append double-counted")
    // compaction folds the partials without changing a single cell
    CountMin.compactGridStore(spark, store)
    assert(cells(CountMin.readMergedGrid(spark, store)) == merged,
      "compaction changed the grid")
    // a batch replayed AFTER compaction flattened its _SUCCESS marker
    // is blocked by the high-water mark — replay-safe by construction
    assert(CountMin.highWater(spark, store).contains(1L))
    CountMin.appendBatchGrid(b2, "term", d, w, store, batchId = Some(1L))
    assert(cells(CountMin.readMergedGrid(spark, store)) == merged,
      "post-compaction replay double-counted")
    // and the store keeps absorbing after compaction
    CountMin.appendBatchGrid(b1, "term", d, w, store, batchId = Some(2L))
    val twice = cells(CountMin.merge(
      CountMin.sketch(b1, "term", d, w)
        .unionByName(CountMin.sketch(corpus, "term", d, w))))
    assert(cells(CountMin.readMergedGrid(spark, store)) == twice)
    // second compaction advances the mark monotonically
    CountMin.compactGridStore(spark, store)
    assert(CountMin.highWater(spark, store).contains(2L))
  }

  test("unobserved probes estimate 0 even under partial collisions") {
    val d = 4; val w = 8 // narrow grid: collisions in SOME rows are likely
    val grid = CountMin.merge(CountMin.sketch(corpus, "term", d, w))
    val probes = (1 to 30).map(i => s"never$i").toDF("term")
    val est = CountMin.estimates(grid, probes, "term", d, w)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.size == 30, "every probe gets a row, observed or not")
    // 40 distinct terms over w=8 buckets: every bucket in every row is
    // occupied, so this narrow grid can't distinguish unobserved terms
    // — widen until some cells are empty and assert the zero path there
    val wide = 4096
    val grid2 = CountMin.merge(CountMin.sketch(corpus, "term", d, wide))
    val est2 = CountMin.estimates(grid2, probes, "term", d, wide)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est2.values.forall(_ == 0L),
      s"unobserved probes in a sparse grid must estimate 0: $est2")
  }
}
