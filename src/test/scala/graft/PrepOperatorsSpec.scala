package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the sequence-prep / layout operators beyond their
  * oracle-pinned query settings: [[graft.llm.Chunker]],
  * [[graft.llm.Lexical]], [[graft.operators.ZOrder]]. */
class PrepOperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("chunker covers every token; consecutive chunks overlap by window−stride") {
    val s = spark
    import s.implicits._
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = graft.llm.Chunker.chunk(df, "id", "text", window = 32, stride = 24)
      .orderBy("chunk_id").collect()
    // 100 tokens, w=32, s=24 → 1 + ceil(68/24) = 4 chunks
    assert(chunks.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    // chunk k starts at 24k: full windows except the tail (100−72=28)
    assert(chunks.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 28))
    // coverage: last chunk start 72 + 28 = 100 = every token seen;
    // overlap: consecutive starts differ by 24 < 32 → 8-token overlap
  }

  test("chunker: short doc yields exactly one whole-doc chunk") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val rows = graft.llm.Chunker.chunk(df, "id", "text", 32, 24).collect()
    assert(rows.length == 1 && rows.head.getInt(1) == 0 && rows.head.getInt(2) == 3)
    assert(rows.head.getLong(3) == graft.functions.PolyHash.hash("a b c"))
  }

  test("lexical search matches a brute-force tf·idf reference") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "apple cherry cherry date"), (4L, "date date date"))
    val terms = Seq("apple", "cherry")
    val n = corpus.size.toLong
    val tf = corpus.map { case (id, t) =>
      id -> terms.map(q => q -> t.split(" ").count(_ == q).toLong).filter(_._2 > 0).toMap
    }.toMap
    val dft = terms.map(q => q -> tf.values.count(_.contains(q)).toLong).toMap
    val expected = tf.collect { case (id, m) if m.nonEmpty =>
      (id, m.map { case (q, f) => f * ((n * 1000000L) / dft(q)) }.sum, m.size)
    }.toSet
    val got = graft.llm.Lexical.search(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("packer: batch*capacity + offset reconstructs the bucket token stream") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 200L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(60))("w").mkString(" ")))
    val packed = graft.llm.Packer
      .pack(docs.toDF("id", "text"), "id", "text", capacity = 64, buckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val byBucket = packed.groupBy(_._2)
    assert(byBucket.keySet == Set(0, 1, 2, 3))
    byBucket.foreach { case (b, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, batch, offset, n) =>
        assert(id % 4 == b)
        // the doc starts exactly where the previous ones ended
        assert(batch * 64 + offset == cum, s"doc $id misplaced")
        assert(n == docs(id.toInt)._2.split(" ").length)
        cum += n
      }
      // the last doc's batch never exceeds the stream's final cut
      assert(rows.map(_._3).max <= (cum - 1) / 64)
    }
  }

  test("packCounts on explicit counts equals pack on the text it came from") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val docs = (0L until 80L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
    val viaText = graft.llm.Packer
      .pack(docs.toDF("id", "text"), "id", "text", capacity = 50, buckets = 3)
      .collect().map(_.toSeq).toSet
    val viaCounts = graft.llm.Packer
      .packCounts(docs.map { case (i, t) => (i, t.split(" ").length) }
          .toDF("id", "n"), "id", "n", capacity = 50, buckets = 3)
      .collect().map(_.toSeq).toSet
    assert(viaText == viaCounts)
  }

  test("z-value matches a reference interleave and preserves rectangle locality") {
    val s = spark
    import s.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", graft.operators.ZOrder.zValue(col("x"), col("y"), bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y, 4)) }
    // z is a bijection on the 16×16 grid
    assert(got.values.toSet.size == 256)
    // locality: each quarter of z-space is exactly one 8×8 quadrant
    val byShard = got.groupBy(_._2 >> 6).view.mapValues(_.keys.toSeq)
    byShard.foreach { case (_, cell) =>
      assert(cell.map(_._1).max - cell.map(_._1).min <= 7)
      assert(cell.map(_._2).max - cell.map(_._2).min <= 7)
    }
  }

  test("z-score matches a scala reference; degenerate groups are dropped") {
    val s = spark
    import s.implicits._
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
      .union(Seq((90L, "solo", 5.0), (91L, "const", 2.0), (92L, "const", 2.0))
        .toDF("id", "grp", "v"))
    val got = graft.operators.Outliers.withZScore(df, "v", Seq("grp"))
      .select("id", "z").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // solo group (n=1) and zero-variance group produce no rows
    assert(got.keySet == vals.indices.map(_.toLong).toSet)
    val n = vals.size.toDouble
    val mean = vals.sum / n
    val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(got(i.toLong) - (v - mean) / std) < 1e-9)
    }
    assert(graft.operators.Outliers.flag(df, "v", Seq("grp"), 1.5)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("bigram model counts adjacent pairs and normalizes per context") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val got = graft.llm.TextStats.bigramModel(df, "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // pairs: (a,b)×3, (b,a)×1, (b,c)×1; doc 3 has no bigram
    assert(got == Map(
      ("a", "b") -> ((3L, 3L, 1.0)),
      ("b", "a") -> ((1L, 2L, 0.5)),
      ("b", "c") -> ((1L, 2L, 0.5))))
  }

  test("bigram surprise averages add-one-smoothed corpus probabilities") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val got = graft.llm.TextStats.bigramSurprise(df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // model: cnt(a,b)=3 ctx(a)=3; cnt(b,a)=1, cnt(b,c)=1 ctx(b)=2;
    // V = |{a,b,c}| = 3
    val pAB = 4.0 / 6.0   // (3+1)/(3+3)
    val pBA = 2.0 / 5.0   // (1+1)/(2+3)
    val pBC = 2.0 / 5.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.keySet == Set(1L, 2L))           // doc 3 has no bigrams
    assert(got(1L)._1 == 4L && got(2L)._1 == 1L)
    assert(got(1L)._2 == r6((pAB + pBA + pAB + pBC) / 4.0))
    assert(got(2L)._2 == r6(pAB))
    // the unique-phrasing doc scores strictly lower than the common one
    assert(got(2L)._2 > got(1L)._2)
  }

  test("bm25 matches a brute-force rational reference and ranks by saturation") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),            // tf(apple)=2, dl=3
      (2L, "banana cherry"),                 // tf(cherry)=1, dl=2
      (3L, "apple cherry cherry date"),      // both terms, dl=4
      (4L, "date date date"))                // no terms
    val terms = Seq("apple", "cherry")
    val nd = corpus.size.toLong
    val tt = corpus.map(_._2.split(" ").length.toLong).sum
    def termScore(tf: Long, dl: Long, dft: Long): Double =
      math.rint(((2 * nd - 2 * dft + 1) * 22 * tt * tf).toDouble /
        ((2 * dft + 1) * (10 * tt * tf + 3 * tt + 9 * dl * nd)).toDouble * 1e9) / 1e9
    val dft = Map("apple" -> 2L, "cherry" -> 2L)
    val expected = corpus.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val scores = terms.flatMap { q =>
        val tf = toks.count(_ == q).toLong
        if (tf > 0) Some(termScore(tf, toks.length.toLong, dft(q))) else None
      }
      if (scores.isEmpty) None
      else Some(id -> ((scores.size, math.rint(scores.sum * 1e6) / 1e6)))
    }.toMap
    val got = graft.llm.Lexical.bm25Search(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, topK = 10)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // doc 3 matches both terms and must outrank the single-term docs
    assert(got(3L)._2 > got(1L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("BFS min-hops: cycle, shortcut, depth cut, unreachable, multi-seed") {
    val s = spark
    import s.implicits._
    // 1→2→3→4→5→1 cycle plus shortcut 1→4; 9→10 disconnected; seed {1, 9}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (1L, 4L),
      (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("node")
    val got = graft.operators.Bfs.minHops(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortcut wins over the long way (4 at hop 1, not 3); 5 at hop 2
    // via the shortcut; 3 at hop 2; cycle never revisits 1 at hop 5
    assert(got == Map(1L -> 0, 9L -> 0, 2L -> 1, 4L -> 1, 10L -> 1,
      3L -> 2, 5L -> 2))
    // depth 0 = seeds only; nothing expands
    val h0 = graft.operators.Bfs.minHops(edges, seeds, maxHops = 0)
      .collect().map(_.getLong(0)).toSet
    assert(h0 == Set(1L, 9L))
    // early exit: once the component is exhausted, deeper bounds add nothing
    val deep = graft.operators.Bfs.minHops(edges, seeds, maxHops = 100)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(deep == got)
  }
}
