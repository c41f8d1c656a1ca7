package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operators, each pinned against a plain-Scala reference on
  * hand data: interpolated Kneser–Ney smoothing, deterministic label
  * propagation, and the l-diversity audit.
  */
class Round13OperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("kneserNeyBigram matches a plain-Scala reference and sums to ≤ 1 per context") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      "the cat sat on the mat",
      "the cat ate the fish",
      "a dog sat on a log",
      "the dog ate a bone")
    val df = corpus.toDF("text")
    val got = graft.llm.TextStats.kneserNeyBigram(df, "text")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap

    // plain-Scala reference
    val pairs = corpus.flatMap(t => t.split(" ").sliding(2).map(a => (a(0), a(1))))
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = cnt.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong) }
    val cont = cnt.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val b = cnt.size.toDouble
    assert(got.keySet == cnt.keySet)
    cnt.foreach { case ((w1, w2), c) =>
      val (ctxCnt, n1p) = ctx(w1)
      val expected = (c.toDouble - 0.75) / ctxCnt +
        0.75 * n1p.toDouble / ctxCnt * (cont(w2).toDouble / b)
      val (gc, gctx, gn1p, gcont, gp) = got((w1, w2))
      assert(gc == c && gctx == ctxCnt && gn1p == n1p && gcont == cont(w2))
      assert(math.abs(gp - expected) < 1e-12, s"($w1,$w2): $gp vs $expected")
    }
    // each context's observed-bigram mass stays below 1 (the held-out
    // mass goes to unseen continuations — the point of the discount)
    val byCtx = got.toSeq.groupBy(_._1._1)
      .map { case (_, xs) => xs.map(_._2._5).sum }
    byCtx.foreach(m => assert(m > 0 && m <= 1.0 + 1e-9))
  }

  test("LabelPropagation: two triangles joined by a bridge keep distinct communities") {
    val s = spark
    import s.implicits._
    // nodes 1-2-3 and 4-5-6 are triangles; 3—4 is the bridge. CC would
    // label everything 1; frequency voting must keep two communities.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    val labels = graft.operators.LabelPropagation.run(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (1L to 6L).toSet)
    // the two triangles never share a label at any round (min-tie-break
    // voting keeps label 1 inside {1,2,3} and ≤4 inside {4,5,6})
    val left = Set(1L, 2L, 3L).map(labels)
    val right = Set(4L, 5L, 6L).map(labels)
    assert(left.intersect(right).isEmpty,
      s"bridge flooded the components: $labels")
  }

  test("LabelPropagation round arithmetic: star graph converges to the hub vote") {
    val s = spark
    import s.implicits._
    // hub 10, leaves 11..14: after round 1 every leaf holds the hub's
    // label (its only neighbor) and the hub holds min(leaf labels);
    // after round 2 the hub sees all leaves holding 10 → everyone 10...
    // except leaves see hub holding 11. Synchronous LPA oscillates on
    // bipartite graphs — pin the exact deterministic state instead.
    val und = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    def after(iters: Int): Map[Long, Long] =
      graft.operators.LabelPropagation.run(edges, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1) == Map(10L -> 11L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L))
    assert(after(2) == Map(10L -> 10L, 11L -> 11L, 12L -> 11L, 13L -> 11L, 14L -> 11L))
  }

  test("LabelPropagation directed input: a voteless node keeps its prior label") {
    val s = spark
    import s.implicits._
    // Directed chain 1→2→3: node 2's only dst (3) never occurs as a
    // src, so 3 has no label row and 2 gets ZERO votes in round 1 —
    // pre-fix it vanished from the table (and 1 cascaded away in round
    // 2). The spine left-join keeps both at their prior labels.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    def after(iters: Int): Map[Long, Long] =
      graft.operators.LabelPropagation.run(edges, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1) == Map(1L -> 2L, 2L -> 2L)) // 1 hears 2; 2 voteless, keeps 2
    assert(after(2) == Map(1L -> 2L, 2L -> 2L)) // stable; nobody dropped
  }

  test("q216 PCA pass: loadings scaled to unit max, variance shares sum to 1") {
    val df = graft.queries.Similarity.q216(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 64)
    val l1 = rows.map(_.getDouble(1))
    val l2 = rows.map(_.getDouble(2))
    val vs = rows.map(_.getDouble(3))
    val lam = rows.map(_.getDouble(4)).distinct
    assert(l1.forall(v => math.abs(v) <= 1.0) && l1.exists(v => math.abs(v) == 1.0))
    assert(l2.forall(v => math.abs(v) <= 1.0) && l2.exists(v => math.abs(v) == 1.0))
    // diagonal of a covariance matrix is non-negative; shares sum to 1
    assert(vs.forall(_ >= 0.0))
    assert(math.abs(vs.sum - 1.0) < 1e-4, s"var shares sum to ${vs.sum}")
    // one λ̂ for the whole table, and it is a positive-definite-form ratio
    assert(lam.length == 1 && lam.head > 0.0)
  }

  test("lDiversity: homogeneous group fails, diverse group passes") {
    val s = spark
    import s.implicits._
    // group A: 4 rows, all sensitive=1 → entropy 0, distinct 1: fails
    // group B: 4 rows, sensitive 1,2,3,4 → entropy ln4 > ln3: passes
    // group C: 4 rows, sensitive 1,1,1,2 → distinct 2 < 3: fails both
    val df = (Seq.fill(4)(("A", 1L)) ++
      Seq(("B", 1L), ("B", 2L), ("B", 3L), ("B", 4L)) ++
      Seq(("C", 1L), ("C", 1L), ("C", 1L), ("C", 2L))).toDF("qi", "sens")
    val got = graft.operators.Quality
      .lDiversity(df, Seq("qi"), col("sens"), l = 3)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(got("A") == ((4L, 1L, 0.0, false, false)))
    val (bn, bd, bent, bdok, beok) = got("B")
    assert(bn == 4L && bd == 4L && bdok && beok)
    assert(math.abs(bent - math.log(4.0)) < 1e-6)
    val (cn, cd, cent, cdok, ceok) = got("C")
    assert(cn == 4L && cd == 2L && !cdok && !ceok)
    // entropy of (3/4, 1/4) = ln4 - (3/4)ln3 ≈ 0.5623
    assert(math.abs(cent - (math.log(4.0) - 0.75 * math.log(3.0))) < 1e-6)
  }
}
