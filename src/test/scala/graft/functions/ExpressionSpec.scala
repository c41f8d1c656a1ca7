package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression semantics: interpreted vs codegen parity and the
  * cross-engine value contract (expected values mirror the oracle's
  * list_reduce / round() arithmetic).
  */
class ExpressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("PolyHash.hash matches the portable fold (incl. multibyte)") {
    assert(PolyHash.hash("hello") == 99162322L)
    assert(PolyHash.hash("héllo 世界") == 394285854L)
    assert(PolyHash.hash("x") == 120L)
    assert(PolyHash.hash("") == 0L)
  }

  test("poly_hash SQL function: codegen path equals the Scala fold") {
    GraftFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      "SELECT poly_hash(v) FROM VALUES ('hello'), ('héllo 世界'), ('') t(v)")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(99162322L, 394285854L, 0L))
  }

  test("multi_needle_count: greedy non-overlap equals the replace arithmetic") {
    GraftFunctions.ensureRegistered(spark)
    // oracle form: (len(t) - len(replace(t, nd, ''))) / len(nd) per needle
    def refCount(t: String, nds: Seq[String]): Long =
      nds.filter(_.nonEmpty)
        .map(nd => (t.length - t.replace(nd, "").length) / nd.length)
        .map(_.toLong).sum
    val cases = Seq(
      ("slow slow slow scan", Seq("slow slow", "slow scan")),
      ("aaaa", Seq("aa")), // greedy non-overlap: 2, not 3
      ("hash join hash join", Seq("hash join", "join")),
      ("", Seq("x")),
      ("abc", Seq("")), // empty needle contributes zero
      ("xyxyxy", Seq("xyx", "yxy")))
    cases.foreach { case (t, nds) =>
      val arr = nds.map(n => s"'$n'").mkString(", ")
      val got = spark.sql(s"SELECT multi_needle_count('$t', array($arr))")
        .head().getLong(0)
      assert(got == refCount(t, nds), s"text='$t' needles=$nds")
    }
  }

  test("multi_needle_count: null text is null, null needles are skipped") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT multi_needle_count(cast(null as string), array('a')),
        |       multi_needle_count('aba', array(cast(null as string), 'a'))""".stripMargin)
      .head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 2L)
  }

  test("nfc_normalize: composes NFD sequences, idempotent, ASCII zero-copy") {
    GraftFunctions.ensureRegistered(spark)
    val nfd = "cafe\u0301" // e + combining acute (NFD)
    val nfc = "caf\u00e9"  // precomposed (NFC)
    val r = spark.sql(
      s"SELECT nfc_normalize('$nfd'), length(nfc_normalize('$nfd')), " +
        s"nfc_normalize('$nfc'), nfc_normalize('plain ascii'), " +
        "nfc_normalize(''), nfc_normalize(cast(null as string))").head()
    assert(r.getString(0) == nfc)
    assert(r.getInt(1) == 4)
    assert(r.getString(2) == nfc) // already-NFC fast path: unchanged
    assert(r.getString(3) == "plain ascii")
    assert(r.getString(4) == "")
    assert(r.isNullAt(5))
    // idempotence: NFC(NFC(x)) == NFC(x) over a mixed corpus
    val mixed = Seq("a\u0301e\u0301", "\ufb01n", "\ud55c\uad6d\uc5b4", "x\u0300\u0301")
    mixed.foreach { v =>
      val once = spark.sql(s"SELECT nfc_normalize('$v')").head().getString(0)
      val twice = spark.sql(
        s"SELECT nfc_normalize(nfc_normalize('$v'))").head().getString(0)
      assert(once == twice, s"not idempotent on ${v.codePoints().toArray.toSeq}")
    }
  }

  test("nfc_normalize: wrong arity fails analysis instead of ignoring args") {
    GraftFunctions.ensureRegistered(spark)
    // pre-fix, nfc_normalize('a','b') silently dropped the 2nd arg
    val e = intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").head()
    }
    assert(e.getMessage.contains("nfc_normalize expects exactly 1 argument"),
      s"unexpected failure mode: ${e.getMessage}")
    intercept[Exception] { spark.sql("SELECT nfc_normalize()").head() }
  }

  test("nfc_normalize: interpreted eval matches codegen and the JDK") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val cases = Seq("cafe\u0301", "caf\u00e9", "ascii", "", "a\u030a", "\ud55c")
    cases.foreach { v =>
      val interp = NfcNormalize(Literal(v)).eval(null).toString
      val gen = spark.sql(s"SELECT nfc_normalize(v) FROM VALUES ('$v') t(v)")
        .head().getString(0)
      assert(interp == gen, s"eval paths disagree on ${v.codePoints().toArray.toSeq}")
      assert(interp == java.text.Normalizer
        .normalize(v, java.text.Normalizer.Form.NFC))
    }
  }

  test("minhash_sig: null array elements are skipped, not hashed as 0") {
    GraftFunctions.ensureRegistered(spark)
    // registered SQL function is callable on arbitrary array<bigint>;
    // a null element must contribute nothing, and an all-null array is
    // an empty shingle set → null signature
    val rows = spark.sql(
      """SELECT minhash_sig(array(cast(null as bigint), 5L), 4),
        |       minhash_sig(array(5L), 4),
        |       minhash_sig(array(cast(null as bigint)), 4)""".stripMargin).head()
    assert(rows.getSeq[Long](0) == rows.getSeq[Long](1))
    assert(rows.isNullAt(2))
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    val keys = (1L to 1000L).toDF("k")
    keys.createOrReplaceTempView("bloom_keys")
    val probes = (1L to 20000L).toDF("p")
    probes.createOrReplaceTempView("bloom_probes")
    // 2^14 bits / 1000 keys ≈ 16 bits per key at 5 hashes → fp ≪ 1%
    val hits = spark.sql(
      """SELECT p FROM bloom_probes CROSS JOIN
        |  (SELECT bloom_build(k, 16384, 5) AS b FROM bloom_keys)
        |WHERE bloom_contains(b, p, 5)""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert((1L to 1000L).forall(hits), "false negative — bloom must never drop a member")
    val fps = hits.count(_ > 1000L)
    assert(fps < 190, s"false-positive rate implausibly high: $fps/19000")
  }

  test("bloom-prefiltered join equals the plain join") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val probe = (1L to 5000L).map(i => (i, i % 97)).toDF("pk", "payload")
    val build = (1L to 5000L by 7).map(i => (i, s"v$i")).toDF("bk", "tag")
    val got = graft.operators.BloomJoin
      .join(probe, build, "pk", "bk", numBits = 1 << 12, numHashes = 5)
      .select("pk", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = probe.join(build, col("pk") === col("bk"))
      .select("pk", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected)
  }

  test("vector_dot_scaled: exact scaled-long sum, both eval paths") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(
      """SELECT vector_dot_scaled(
        |  array(cast(0.5 as float), cast(-1.5 as float)),
        |  array(cast(2.0 as float), cast(1.0 as float)))""".stripMargin)
    // 0.5*2.0 = 1.0 → 1e12; -1.5*1.0 = -1.5 → -1.5e12; sum = -5e11
    assert(df.head().getLong(0) == -500000000000L)
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit1 = Literal.create(ArrayData.toArrayData(Array(0.5f, -1.5f)), ArrayType(FloatType))
    val lit2 = Literal.create(ArrayData.toArrayData(Array(2.0f, 1.0f)), ArrayType(FloatType))
    assert(VectorDotScaled(lit1, lit2).eval(null) == -500000000000L)
  }

  test("topk_neighbors: imperative aggregate equals the typed Aggregator") {
    GraftFunctions.ensureRegistered(spark)
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // deterministic synthetic candidates incl. cosine ties
    val df = (1 to 500).map { i =>
      (i % 20L, (i * 37 % 100).toLong, (i * 31 % 7) / 7.0)
    }.toDF("va", "vb", "cos").dropDuplicates("va", "vb")
    val imperative = df.groupBy($"va")
      .agg(expr("topk_neighbors(vb, cos, 3)").as("top"))
      .select($"va", expr("transform(top, t -> struct(t.vb, t.cos))").as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toList).toMap
    val typed = udaf(new TopKNeighbors(3))
    val viaUdaf = df.groupBy($"va").agg(typed($"vb", $"cos").as("top"))
      .select($"va", expr("transform(top, t -> struct(t._1 as vb, t._2 as cos))").as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toList).toMap
    assert(imperative.keySet == viaUdaf.keySet)
    imperative.foreach { case (k, v) => assert(viaUdaf(k) == v, s"group $k") }
  }

  test("shingle_hashes: rolling hash equals the compositional pipeline") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, size, split}
    // random texts incl. multibyte, repeated shingles, empty tokens
    // (consecutive spaces), and too-short docs — the rolling-prefix
    // derivation must reproduce poly_hash-of-concat_ws exactly
    val rnd = new scala.util.Random(11)
    val vocab = Vector("the", "héllo", "世界", "a", "", "zz9", "dup", "dup")
    val texts = (1 to 200).map { _ =>
      Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ "one two" :+ "  " :+ "a b c"
    for (n <- Seq(2, 3)) {
      val df = texts.toDF("text")
        .select(split($"text", " ").as("toks"))
        .where(size($"toks") >= n)
      val reference = df.select(expr(
          s"array_sort(array_distinct(transform(" +
            s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', ${(0 until n).map(k => s"toks[i+$k]").mkString(", ")}))," +
            " s -> poly_hash(s))))").as("hs"))
        .collect().map(_.getSeq[Long](0).toList)
      val rolling = df.select(expr(s"shingle_hashes(toks, $n)").as("hs"))
        .collect().map(_.getSeq[Long](0).toList)
      assert(rolling.toSeq == reference.toSeq, s"n=$n")
    }
  }

  test("vector_dot_scaled: codegen equals interpreted on mixed-sign data") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Array.tabulate(64)(i => (math.sin(i * 1.7) * (if (i % 3 == 0) -1 else 1)).toFloat)
    val b = Array.tabulate(64)(i => (math.cos(i * 0.9) * (if (i % 5 == 0) -1 else 1)).toFloat)
    val interpreted = VectorDotScaled(
      Literal.create(ArrayData.toArrayData(a), ArrayType(FloatType)),
      Literal.create(ArrayData.toArrayData(b), ArrayType(FloatType))).eval(null)
    val sqlArr = (x: Array[Float]) => x.map(v => s"cast($v as float)").mkString("array(", ",", ")")
    val codegen = spark.sql(
      s"SELECT vector_dot_scaled(${sqlArr(a)}, ${sqlArr(b)})").head().getLong(0)
    assert(codegen == interpreted)
  }

  test("long_vector_dot: codegen equals interpreted equals the SQL fold") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // SQ8-shaped mixed data incl. zeros and the 255 extreme
    val a = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toLong)
    val b = Array.tabulate(64)(i => ((i * 91 + 5) % 256).toLong)
    val expected = a.zip(b).map { case (x, y) => x * y }.sum
    val interpreted = LongVectorDot(
      Literal.create(ArrayData.toArrayData(a), ArrayType(LongType)),
      Literal.create(ArrayData.toArrayData(b), ArrayType(LongType))).eval(null)
    assert(interpreted == expected)
    val sqlArr = (x: Array[Long]) => x.map(v => s"${v}L").mkString("array(", ",", ")")
    val codegen = spark.sql(
      s"SELECT long_vector_dot(${sqlArr(a)}, ${sqlArr(b)})").head().getLong(0)
    assert(codegen == expected)
    // the declarative fold it replaced produces the identical value
    val fold = spark.sql(
      s"""SELECT aggregate(zip_with(${sqlArr(a)}, ${sqlArr(b)},
         |  (x, y) -> x * y), 0L, (acc, v) -> acc + v)""".stripMargin)
      .head().getLong(0)
    assert(fold == expected)
    // zip-to-shorter length contract
    assert(spark.sql("SELECT long_vector_dot(array(2L, 3L, 9L), array(5L, 7L))")
      .head().getLong(0) == 31L)
  }

  test("long_vector_l2: codegen equals interpreted equals the SQL fold") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // 1e-6-lattice-shaped mixed-sign data (the KMeans.quantize range)
    val a = Array.tabulate(64)(i => ((i * 773 - 31) % 2000000).toLong)
    val b = Array.tabulate(64)(i => ((i * 911 + 17) % 2000000 * (if (i % 2 == 0) -1 else 1)).toLong)
    val expected = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val interpreted = LongVectorL2(
      Literal.create(ArrayData.toArrayData(a), ArrayType(LongType)),
      Literal.create(ArrayData.toArrayData(b), ArrayType(LongType))).eval(null)
    assert(interpreted == expected)
    val sqlArr = (x: Array[Long]) => x.map(v => s"${v}L").mkString("array(", ",", ")")
    val codegen = spark.sql(
      s"SELECT long_vector_l2(${sqlArr(a)}, ${sqlArr(b)})").head().getLong(0)
    assert(codegen == expected)
    val fold = spark.sql(
      s"""SELECT aggregate(zip_with(${sqlArr(a)}, ${sqlArr(b)},
         |  (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)""".stripMargin)
      .head().getLong(0)
    assert(fold == expected)
  }

  test("decimal_l2: codegen equals interpreted equals the decimal-SUM form") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    // embedding-magnitude mixed-sign data, float vector vs double codebook
    val x = Array.tabulate(64)(i => ((i * 773 - 3100) / 6400.0).toFloat)
    val c = Array.tabulate(64)(i => (i * 911 % 97 - 48) / 970.0)
    val interpreted = DecimalL2(
      Literal.create(ArrayData.toArrayData(x), ArrayType(FloatType)),
      Literal.create(ArrayData.toArrayData(c), ArrayType(DoubleType))).eval(null)
      .asInstanceOf[Double]
    val sqlX = x.map(v => s"CAST($v AS FLOAT)").mkString("array(", ",", ")")
    val sqlC = c.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ",", ")")
    val codegen = spark.sql(s"SELECT decimal_l2($sqlX, $sqlC)").head().getDouble(0)
    assert(codegen == interpreted)
    // the decimal SUM it replaces (ivfAssign's original shuffled form)
    // produces the identical double — per-term HALF_UP at scale 12,
    // exact addition, one decimal→double conversion at the end
    val sum = spark.sql(
      s"""SELECT CAST(SUM(CAST((x - c) * (x - c) AS DECIMAL(38,12))) AS DOUBLE)
         |FROM (SELECT CAST(xe AS DOUBLE) AS x, ce AS c
         |      FROM (SELECT posexplode($sqlX) AS (i, xe)) a
         |      JOIN (SELECT posexplode($sqlC) AS (j, ce)) b ON i = j)""".stripMargin)
      .head().getDouble(0)
    assert(sum == interpreted, s"native $interpreted != decimal SUM $sum")
    // zip-to-shorter length contract
    assert(spark.sql(
      "SELECT decimal_l2(array(CAST(1.5 AS FLOAT), CAST(9 AS FLOAT)), array(CAST(0.5 AS DOUBLE)))")
      .head().getDouble(0) == 1.0)
  }

  test("long_vector_eq_count equals the filter/zip_with form on signature data") {
    GraftFunctions.ensureRegistered(spark)
    // minhash-shaped signatures with engineered agreements
    val a = Array.tabulate(12)(i => (i * 1009L) % 97)
    val b = Array.tabulate(12)(i => if (i % 3 == 0) (i * 1009L) % 97 else (i * 1013L) % 89)
    val expected = a.zip(b).count { case (x, y) => x == y }
    val sqlArr = (x: Array[Long]) => x.map(v => s"${v}L").mkString("array(", ",", ")")
    val native = spark.sql(
      s"SELECT long_vector_eq_count(${sqlArr(a)}, ${sqlArr(b)})").head().getInt(0)
    val declarative = spark.sql(
      s"""SELECT size(filter(zip_with(${sqlArr(a)}, ${sqlArr(b)},
         |  (x, y) -> x = y), v -> v))""".stripMargin).head().getInt(0)
    assert(native == expected && declarative == expected)
  }

  test("multi_needle_count: Aho–Corasick equals the indexOf loop on random needle sets") {
    // the per-needle greedy reference the automaton must reproduce
    def loopCount(text: String, nd: String): Long = {
      var total = 0L; var from = 0
      var p = text.indexOf(nd, from)
      while (p >= 0) { total += 1; from = p + nd.length; p = text.indexOf(nd, from) }
      total
    }
    val rnd = new scala.util.Random(186)
    // a 3-letter alphabet makes overlapping/prefix/suffix needle
    // relations ("a" < "ab" < "aba", "ba" vs "ab") the COMMON case
    def randStr(n: Int) =
      (1 to n).map(_ => "abc" (rnd.nextInt(3))).mkString
    for (trial <- 1 to 20) {
      val needles = (Array.fill(60)(randStr(1 + rnd.nextInt(6)))
        ++ Array("a", "ab", "aba", "abab", "ba", "b", "aa", "aaa")
        ++ Array.fill(5)(randStr(2))) // duplicates stay: each copy counts
      val text = randStr(200 + rnd.nextInt(800))
      val expected = needles.map(loopCount(text, _)).sum
      val ac = new AhoCorasick(needles)
      assert(ac.countNonOverlap(text) == expected, s"trial=$trial")
      // second call on the same (thread-local) scratch must not bleed
      // greedy cursors across rows
      assert(ac.countNonOverlap(text) == expected, s"trial=$trial re-run")
    }
    // end-to-end through SQL: 133 needles >= AcThreshold engages the
    // automaton inside whole-stage codegen
    val needles = (Array.fill(125)(randStr(1 + rnd.nextInt(6)))
      ++ Array("a", "ab", "aba", "abab", "ba", "b", "aa", "aaa"))
    assert(needles.length >= MultiNeedleCount.AcThreshold)
    val text = randStr(1000)
    val arr = needles.map(n => s"'$n'").mkString("array(", ",", ")")
    val got = spark.sql(s"SELECT multi_needle_count('$text', $arr)")
      .head().getLong(0)
    assert(got == needles.map(loopCount(text, _)).sum)
  }

  test("packed_sign_word: codegen equals interpreted equals the aggregate fold") {
    GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val sqlArr = (x: Array[Long]) => x.map(v => s"${v}L").mkString("array(", ",", ")")
    // deterministic pseudo-random trials: mixed-sign 1e6-lattice values
    // with a corpus-count multiplier, over every word window the
    // binary-code builders use — incl. bit 63 (hi - lo = 63) and a
    // window past the array end (element_at → NULL → no bit)
    val rnd = new scala.util.Random(181)
    for (trial <- 1 to 25) {
      val dims = 1 + rnd.nextInt(64)
      val n = 1L + rnd.nextInt(1000000)
      val sv = Array.fill(dims)(rnd.nextLong(4000001L) - 2000000L)
      val tot = Array.fill(dims)(rnd.nextLong(4000001L * n) - 2000000L * n)
      for ((lo, hi) <- Seq((0, 31), (32, 63), (0, 63), (0, dims - 1))) {
        val expected = (lo to hi).foldLeft(0L) { (acc, i) =>
          if (i < dims && sv(i) * n > tot(i)) acc | (1L << (i - lo)) else acc
        }
        val interpreted = PackedSignWord(
          Literal.create(ArrayData.toArrayData(sv), ArrayType(LongType)),
          tot, n, lo, hi).eval(null)
        assert(interpreted == expected, s"interpreted trial=$trial lo=$lo hi=$hi")
        val codegen = spark.sql(
          s"""SELECT packed_sign_word(${sqlArr(sv)}, ${sqlArr(tot)},
             |  ${n}L, $lo, $hi)""".stripMargin).head().getLong(0)
        assert(codegen == expected, s"codegen trial=$trial lo=$lo hi=$hi")
        // the interpreted higher-order fold this expression replaced
        // (in-bounds windows only — the code builders never exceeded
        // the array, and ANSI element_at would throw past the end)
        if (hi < dims) {
          val fold = spark.sql(
            s"""SELECT aggregate(sequence($lo, $hi), 0L, (acc, i) ->
               |  acc | CASE WHEN element_at(${sqlArr(sv)}, i + 1) * ${n}L
               |                 > element_at(${sqlArr(tot)}, i + 1)
               |        THEN shiftleft(1L, i - $lo) ELSE 0L END)""".stripMargin)
            .head().getLong(0)
          assert(fold == expected, s"fold trial=$trial lo=$lo hi=$hi")
        }
      }
    }
    // null elements contribute no bit, exactly like the fold's NULL CASE
    val withNull = spark.sql(
      "SELECT packed_sign_word(array(5L, NULL, 5L), array(1L, 1L, 1L), 1L, 0, 2)")
      .head().getLong(0)
    assert(withNull == 5L) // bits 0 and 2, not bit 1
    // null vector is null (UnaryExpression null propagation)
    assert(spark.sql(
      "SELECT packed_sign_word(CAST(NULL AS array<bigint>), array(1L), 1L, 0, 0)")
      .head().isNullAt(0))
  }
}
