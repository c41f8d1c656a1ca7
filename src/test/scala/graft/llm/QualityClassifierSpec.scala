package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the trained quality classifier
  * ([[graft.llm.QualityClassifier]]): the full-batch GD training loop
  * against a plain-Scala reference implementation of the identical
  * exact-arithmetic recipe, and the end-to-end property that the
  * filter actually LEARNS a planted content signal — the q203 oracle
  * checks reproducibility, this checks that the verb does its job.
  */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive
  import spark.implicits._

  /** Planted-signal corpus: positive docs draw from a "good" vocab,
    * negative from a "bad" vocab, with shared filler — hashed BoW is
    * separable by construction. Deterministic (no RNG): token choice
    * cycles by index. */
  private def planted(nDocs: Int): Seq[(Long, String, Int)] = {
    val good = Vector("clear", "sourced", "edited", "coherent", "cited")
    val bad = Vector("spam", "garbled", "clickbait", "boiler", "keyword")
    val fill = Vector("the", "data", "of", "text", "page")
    (0 until nDocs).map { i =>
      val y = i % 2
      val vocab = if (y == 1) good else bad
      val toks = (0 until 12 + i % 7).map { j =>
        if (j % 3 == 0) fill((i + j) % fill.size) else vocab((i * 7 + j) % vocab.size)
      }
      (i.toLong, toks.mkString(" "), y)
    }
  }

  /** Plain-Scala replay of the exact training recipe: scale-9
    * rounding (HALF_UP, matching Spark's round), exact BigDecimal
    * dot products and gradients, sigmoid in double rounded at 9. */
  private def referenceTrain(rows: Seq[(Long, String, Int)],
                             cfg: QualityClassifier.Config): Map[Long, Double] = {
    import java.math.{BigDecimal => JBD}
    // JBD.valueOf (= shortest decimal repr of the double) then
    // setScale HALF_UP is exactly Spark's Round-on-double semantics
    def r9(x: Double): JBD =
      JBD.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)
    val b = cfg.buckets
    val feats: Seq[(Long, Map[Int, JBD], Int)] = rows.map { case (id, text, y) =>
      val toks = text.split(" ", -1).toSeq
      val l = toks.size
      val bow = toks.groupBy(t => (graft.functions.PolyHash.hash(t) % b).toInt)
        .map { case (k, v) => k -> r9(v.size.toDouble / l) }
      (id, bow ++ Map(b -> r9(1.0), b + 1 -> r9(l / 100.0)), y)
    }
    val n = feats.size
    var w = Map.empty[Int, JBD].withDefaultValue(JBD.ZERO)
    for (_ <- 1 to cfg.rounds) {
      val grad = scala.collection.mutable.Map.empty[Int, JBD].withDefaultValue(JBD.ZERO)
      feats.foreach { case (_, x, y) =>
        val z = x.map { case (k, v) => v.multiply(w(k)) }
          .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
        val p = r9(1.0 / (1.0 + math.exp(-z)))
        val e = r9(new JBD(y).subtract(p).doubleValue())
        x.foreach { case (k, v) => grad(k) = grad(k).add(e.multiply(v)) }
      }
      w = (0 until b + 2).map { k =>
        k -> r9(w(k).doubleValue() + cfg.eta * grad(k).doubleValue() / n)
      }.toMap.withDefaultValue(JBD.ZERO)
    }
    feats.map { case (id, x, _) =>
      val z = x.map { case (k, v) => v.multiply(w(k)) }
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
      id -> r9(1.0 / (1.0 + math.exp(-z))).doubleValue()
    }.toMap
  }

  test("trained scores match a plain-Scala replay of the exact GD recipe") {
    val cfg = QualityClassifier.Config(buckets = 16, eta = 2.0, rounds = 3)
    val rows = planted(60)
    val df = rows.toDF("id", "text", "y")
    val feats = QualityClassifier.featurize(df, "id", "text", cfg)
    val w = QualityClassifier.train(feats, df.select($"id", $"y"), cfg)
    val got = QualityClassifier.score(feats, w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = referenceTrain(rows, cfg)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-12,
        s"doc $id: engine $s vs reference ${want(id)}")
    }
  }

  test("the filter learns a planted content signal") {
    val cfg = QualityClassifier.Config(buckets = 64, eta = 5.0, rounds = 4)
    val df = planted(200).toDF("id", "text", "y")
    val feats = QualityClassifier.featurize(df, "id", "text", cfg)
    val w = QualityClassifier.train(feats, df.select($"id", $"y"), cfg)
    val acc = QualityClassifier.score(feats, w)
      .join(df.select($"id", $"y"), "id")
      .select(avg(when(($"score" >= 0.5) === ($"y" === 1), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"planted-signal train accuracy $acc < 0.9")
    // and weight magnitudes are bounded (no divergence at this eta)
    val maxW = w.select(max(abs($"w".cast("double")))).head().getDouble(0)
    assert(maxW < 10.0, s"weights diverged: max |w| = $maxW")
  }
}
