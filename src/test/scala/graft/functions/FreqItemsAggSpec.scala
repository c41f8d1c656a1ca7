package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Misra–Gries candidate aggregate: the survivor guarantee (every item
  * with true count > N/(capacity+1) is in the candidate set) must hold
  * under adversarial streams, arbitrary partitioning, and summary
  * merges — the properties the deterministic q85 pipeline rests on.
  */
class FreqItemsAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  private def guaranteeHolds(items: Seq[String], capacity: Int,
                             candidates: Set[String]): Unit = {
    val n = items.size.toLong
    val must = items.groupBy(identity).collect {
      case (k, v) if v.size.toLong * (capacity + 1) > n => k
    }.toSet
    assert(must.subsetOf(candidates),
      s"missing guaranteed heavy hitters: ${must -- candidates}")
  }

  test("sketch guarantee on a skewed stream, capacity far below vocab") {
    val rnd = new Random(7)
    // zipf-ish: item i appears ~ 2000/(i+1) times, vocab 400 >> capacity 16
    val items = rnd.shuffle(
      (0 until 400).flatMap(i => Seq.fill(2000 / (i + 1))(s"w$i")))
    val sk = new FreqSketch(16)
    items.foreach(sk.add)
    guaranteeHolds(items, 16, sk.counts.keySet.toSet)
  }

  test("merge preserves the guarantee across arbitrary splits") {
    val rnd = new Random(13)
    val items = rnd.shuffle(
      (0 until 300).flatMap(i => Seq.fill(1500 / (i + 1))(s"t$i")))
    for (splits <- Seq(2, 5, 9)) {
      val parts = items.grouped(math.max(1, items.size / splits)).toSeq
      val merged = new FreqSketch(16)
      parts.foreach { p =>
        val sk = new FreqSketch(16)
        p.foreach(sk.add)
        merged.mergeIn(sk)
      }
      guaranteeHolds(items, 16, merged.counts.keySet.toSet)
    }
  }

  test("freq_candidates SQL path: exact re-count is partitioning-independent") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val rnd = new Random(21)
    val items = rnd.shuffle(
      (0 until 100).flatMap(i => Seq.fill(800 / (i + 1))(s"k$i")))
    def heavy(parts: Int): Seq[(String, Long)] = {
      items.toDF("tok").repartition(parts).createOrReplaceTempView("fi_toks")
      spark.sql(
        """WITH sk AS (SELECT freq_candidates(tok, 64) AS cands,
          |                    COUNT(*) AS total FROM fi_toks),
          |c AS (SELECT tok, COUNT(*) AS n FROM fi_toks
          |      WHERE tok IN (SELECT explode(cands) FROM sk) GROUP BY tok)
          |SELECT tok, n FROM c, sk WHERE n * 50 > total
          |ORDER BY n DESC, tok""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val exact = items.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter(_._2 * 50 > items.size.toLong)
      .sortBy { case (t, n) => (-n, t) }
    assert(heavy(1) == exact)
    assert(heavy(7) == exact)
    assert(heavy(32) == exact)
  }
}
