package graft

import graft.functions.QDigestBuf
import graft.operators.QDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the q-digest quantile sketch ([[graft.functions.QDigestBuf]],
  * [[graft.operators.QDigest]]): order-independence (the determinism
  * claim), the size and rank-error guarantees, linear-tier merge
  * exactness, and the persisted-store lifecycle (idempotent appends,
  * replay-after-compaction, convergence to the one-shot build).
  */
class QDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private val levels = 8 // universe 256
  private val k = 16

  /** Deterministic skewed values in [0, 256): value v appears ~v/8+1
    * times, plus a heavy spike at 7. */
  private def values: Seq[Long] =
    (0 until 256 by 3).flatMap(v => Seq.fill(v / 8 + 1)(v.toLong)) ++
      Seq.fill(50)(7L)

  private def digestOf(vs: Seq[Long]): Array[(Int, Long, Long)] = {
    val buf = new QDigestBuf(levels, k)
    vs.foreach(buf.addLeaf(_))
    buf.finish()
  }

  test("determinism: arrival order and partitioning never change the digest") {
    val base = digestOf(values)
    assert(digestOf(scala.util.Random.shuffle(values)).toSeq == base.toSeq)
    // split into 4 interleaved parts, merge buffers pairwise
    val parts = values.zipWithIndex.groupBy(_._2 % 4).values.map(_.map(_._1))
    val merged = new QDigestBuf(levels, k)
    parts.foreach { p =>
      val b = new QDigestBuf(levels, k)
      p.foreach(b.addLeaf(_))
      merged.mergeIn(b)
    }
    assert(merged.finish().toSeq == base.toSeq,
      "partial-buffer merge must equal the one-shot build (buffers are " +
        "plain histograms; compression runs once at finish)")
  }

  test("size bound: a finished digest has at most 3k nodes") {
    val d = digestOf(values)
    assert(d.length <= 3 * k, s"digest has ${d.length} nodes > 3k = ${3 * k}")
    // and it compresses: far fewer nodes than distinct values
    assert(d.length < values.distinct.length)
  }

  test("mass conservation and the paper's rank envelope at every decile") {
    val vs = values.sorted
    val n = vs.length.toLong
    val d = digestOf(values)
    assert(d.map(_._3).sum == n, "compression must conserve total mass")
    // in-order walk: (hi asc, lo desc), cumulative; est(q) = first hi
    // whose cum reaches ceil(q·n)
    val walk = d.map { case (l, i, c) =>
      (i * (1L << l), (i + 1) * (1L << l) - 1, c)
    }.sortBy { case (lo, hi, _) => (hi, -lo) }
    val err = levels.toLong * (n / k)
    for (pct <- 10 to 90 by 10) {
      val tgt = (n * pct + 99) / 100
      var cum = 0L
      val est = walk.find { case (_, _, c) => cum += c; cum >= tgt }.get._2
      val rHi = vs.count(_ <= est).toLong
      val rLo = vs.count(_ < est).toLong
      assert(rHi >= tgt, s"p$pct: est $est ranks below target $tgt")
      assert(rLo <= tgt + err,
        s"p$pct: est $est overshoots target $tgt by more than $err")
    }
  }

  test("store lifecycle: idempotent appends, replay-after-compaction no-op, " +
    "one-shot convergence") {
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, if (i % 2 == 0) "a" else "b", v) }
      .toDF("id", "g", "b")
    val store = java.nio.file.Files
      .createTempDirectory("graft-qdigest-store").toString
    val b0 = df.where(col("id") % 2 === 0)
    val b1 = df.where(col("id") % 2 === 1)
    QDigest.appendBatchHist(b0, "b", Seq("g"), store, Some(0L))
    QDigest.appendBatchHist(b1, "b", Seq("g"), store, Some(1L))
    // replay of a committed batch: no double count
    QDigest.appendBatchHist(b1, "b", Seq("g"), store, Some(1L))
    def hist() = QDigest.readMergedHist(spark, store, Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = QDigest.leafHist(df, "b", Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hist() == oneShot, "merged per-batch histograms must equal the " +
      "one-shot histogram (linearity)")
    QDigest.compactHistStore(spark, store, Seq("g"))
    assert(hist() == oneShot, "compaction must not change the merged view")
    // replay AFTER compaction: blocked by the high-water mark
    QDigest.appendBatchHist(b1, "b", Seq("g"), store, Some(1L))
    assert(hist() == oneShot, "a batch replayed after compaction must no-op")
    // serve: digest of the store equals the digest of the raw data
    val served = QDigest.digestOfHist(hist().toSeq.map { case ((g, b), c) =>
      (g, b, c) }.toDF("g", "idx", "cnt"), Seq("g"), levels, k)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getInt(0), x.getLong(1), x.getLong(2)))).toMap
    val direct = df.collect().groupBy(_.getString(1)).map { case (g, rows) =>
      g -> digestOf(rows.map(_.getLong(2)).toSeq).toSeq
    }
    assert(served.view.mapValues(_.toSeq).toMap == direct,
      "the served digest must equal the in-JVM one-shot digest per group")
  }

  test("DataFrame quantiles match the in-JVM walk") {
    val df = values.map(v => ("g", v)).toDF("g", "b")
    val digests = QDigest.digestOfHist(
      QDigest.leafHist(df, "b", Seq("g")), Seq("g"), levels, k)
    val q = QDigest.quantiles(digests, Seq("g"), "nodes", Seq(50, 90))
      .collect().map(r => r.getAs[Int]("pct") -> r.getAs[Long]("est_b")).toMap
    val d = digestOf(values)
    val walk = d.map { case (l, i, c) =>
      (i * (1L << l), (i + 1) * (1L << l) - 1, c)
    }.sortBy { case (lo, hi, _) => (hi, -lo) }
    val n = values.length.toLong
    def est(pct: Int): Long = {
      val tgt = (n * pct + 99) / 100
      var cum = 0L
      walk.find { case (_, _, c) => cum += c; cum >= tgt }.get._2
    }
    assert(q(50) == est(50) && q(90) == est(90))
  }
}
