package graft

import graft.operators.Agreement
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins Fleiss' kappa at its analytic anchor points — the oracle
  * (q167) value-checks the full synthetic stream; these fix the
  * metric's endpoints on corpora small enough to verify by hand.
  */
class AgreementSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  import spark.implicits._

  private def kappaRow(obs: Seq[(Long, Long)], nRaters: Int): Row =
    Agreement.fleissKappa(obs.toDF("item", "lbl"), "item", "lbl", nRaters)
      .head()

  test("perfect agreement gives kappa = 1 regardless of category mix") {
    // 4 items × 3 raters, every rater agrees; two categories in use
    val obs = for (i <- 0L until 4L; _ <- 0 until 3) yield (i, i % 2)
    val r = kappaRow(obs, nRaters = 3)
    assert(r.getAs[Long]("n_items") == 4)
    assert(r.getAs[Int]("n_cats") == 2)
    assert(r.getAs[Double]("po") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("maximal disagreement gives po = 0 and negative kappa") {
    // every item: 3 raters, 3 distinct categories → no agreeing pair
    val obs = for (i <- 0L until 5L; c <- 0L until 3L) yield (i, c)
    val r = kappaRow(obs, nRaters = 3)
    assert(r.getAs[Double]("po") == 0.0)
    // pe = 3 · (1/3)² = 1/3 → kappa = −pe/(1−pe) = −0.5
    assert(r.getAs[Double]("pe") == 0.333333)
    assert(r.getAs[Double]("kappa") == -0.5)
  }

  test("ragged per-item observation counts fail loudly") {
    // item 0 has 3 observations, item 1 only 2 — nRaters=3 is a lie
    val obs = Seq((0L, 0L), (0L, 1L), (0L, 0L), (1L, 0L), (1L, 1L))
    val e = intercept[Exception] { kappaRow(obs, nRaters = 3) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("fleissKappa")), e.getMessage)
  }

  test("single-category corpus gives pe = 1 and NULL kappa, not NaN") {
    val obs = for (i <- 0L until 3L; _ <- 0 until 2) yield (i, 0L)
    val r = kappaRow(obs, nRaters = 2)
    assert(r.getAs[Double]("po") == 1.0)
    assert(r.getAs[Double]("pe") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("hand-computed mixed case matches the closed form") {
    // 2 items, 2 raters: item 0 agrees (cat 0), item 1 splits (0 vs 1)
    // cells: n_00=2, n_10=1, n_11=1 → sum_sq = 6, T = 4
    // po = (6−4)/(4·1) = 0.5; c_0 = 3, c_1 = 1 → pe = (9+1)/16 = 0.625
    // kappa = (0.5−0.625)/(1−0.625) = −1/3
    val obs = Seq((0L, 0L), (0L, 0L), (1L, 0L), (1L, 1L))
    val r = kappaRow(obs, nRaters = 2)
    assert(r.getAs[Double]("po") == 0.5)
    assert(r.getAs[Double]("pe") == 0.625)
    assert(r.getAs[Double]("kappa") == -0.333333)
  }
}
