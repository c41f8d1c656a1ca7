package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator contracts for [[graft.operators.Merge]] and
  * [[graft.llm.Vocab]] beyond the oracle-pinned q64/q65 settings. */
class MergeVocabSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("upsert: update overrides, insert appears, passthrough survives") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "x")
    val updates = Seq((2L, "B", 99), (9L, "new", 1)).toDF("k", "v", "x")
    val got = graft.operators.Merge.upsert(base, updates, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "a", 10), (2L, "B", 99), (3L, "c", 30), (9L, "new", 1)))
  }

  test("upsert rejects mismatched schemas") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "a")).toDF("k", "w")
    assertThrows[IllegalArgumentException] {
      graft.operators.Merge.upsert(base, bad, "k")
    }
  }

  test("vocab ids are dense, frequency-ranked, ties broken by token") {
    val s = spark
    import s.implicits._
    val df = Seq("b b b a a c", "a c d").toDF("text")
    val v = graft.llm.Vocab.build(df, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    // freqs: a=3, b=3, c=2, d=1 → tie a/b broken by token asc
    assert(v == Map("a" -> ((3L, 1)), "b" -> ((3L, 2)),
      "c" -> ((2L, 3)), "d" -> ((1L, 4))))
  }

  test("BPE merges: weighted pair argmax, greedy application, lexicographic ties") {
    val s = spark
    import s.implicits._
    // corpus: "low" ×3, "lower" ×1, "newest" ×2 (word freq weighting)
    val df = Seq("low low lower", "low newest", "newest").toDF("text")
    // round 1: pairs weighted by word freq —
    //   l-o: 3(low)+1(lower)=4, o-w: 4, w-e: 1+2=3, e-r: 1, n-e: 2,
    //   e-w: 2, e-s: 2, s-t: 2 → tie l-o / o-w at 4 → (l,o) wins lex
    // round 2: "lo w", "lo w e r" → lo-w: 4 wins
    // round 3: "low", "low e r", "n e w e s t" → e-w/e-s/n-e/s-t at 2,
    //   w-e 2... lex smallest of the 2-count pairs: (e,s) < (e,w) < (n,e)
    val got = graft.llm.Vocab.bpeMerges(df, "text", numMerges = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(got == List((1, "l", "o", 4L), (2, "lo", "w", 4L), (3, "e", "s", 2L)))
  }

  test("BPE merge application is greedy left-to-right on repeats") {
    val s = spark
    import s.implicits._
    // "aaa": round 1 merges (a,a) with count 2 (two adjacent pairs in
    // one word) → greedy gives [aa, a], so round 2 sees pair (aa, a)
    val df = Seq("aaa").toDF("text")
    val got = graft.llm.Vocab.bpeMerges(df, "text", numMerges = 2)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(got == List((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("BPE merge application merges runs pairwise (token-level greedy)") {
    val s = spark
    import s.implicits._
    // "aaaaaa": the delimiter-consuming replace bug merged alternate
    // occurrences only ("aa a aa a"); token-level greedy must give
    // "aa aa aa" → round 2 sees (aa,aa)×2, round 3 (aaaa,aa)×1
    val df = Seq("aaaaaa").toDF("text")
    val got = graft.llm.Vocab.bpeMerges(df, "text", numMerges = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(got == List((1, "a", "a", 5L), (2, "aa", "aa", 2L), (3, "aaaa", "aa", 1L)))
  }

  test("bpeEncode applies ranked merges per word with cross-word positions and freq-ranked ids") {
    val s = spark
    import s.implicits._
    // merges learned on "low low lower": r1 (l,o)×3, r2 (lo,w)×3 →
    // "low"→[low], "lower"→[low, e, r]
    val df = Seq((1L, "low low lower"), (2L, "lower low")).toDF("id", "text")
    val merges = graft.llm.Vocab.bpeMerges(df.where($"id" === 1L), "text", numMerges = 2)
    val got = graft.llm.Vocab.bpeEncode(df, "id", "text", merges)
      .orderBy("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toList
    // subword freqs over BOTH docs: low×5, e×2, r×2 → ids low=1, e=2, r=3
    assert(got == List(
      (1L, 0, "low", 1), (1L, 1, "low", 1), (1L, 2, "low", 1), (1L, 3, "e", 2), (1L, 4, "r", 3),
      (2L, 0, "low", 1), (2L, 1, "e", 2), (2L, 2, "r", 3), (2L, 3, "low", 1)))
  }

  test("bpeEncode round-trips: subwords concatenated in pos order rebuild the text") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "aaaaaa aaa the thee"),
      (3L, "x"), (4L, "queueing sequences seen")).toDF("id", "text")
    val merges = graft.llm.Vocab.bpeMerges(df, "text", numMerges = 5)
    val enc = graft.llm.Vocab.bpeEncode(df, "id", "text", merges)
    val rebuilt = enc.groupBy($"id")
      .agg(concat_ws("", sort_array(collect_list(struct($"pos", $"subword")))
        .getField("subword")).as("rb"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    df.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      assert(rebuilt(id) == text.replace(" ", ""), s"roundtrip failed for doc $id")
    }
  }

  test("marked encode + bpeDecode is the exact identity, spaces included") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "aaaaaa aaa the thee"),
      (3L, "x"), (4L, "queueing sequences seen")).toDF("id", "text")
    val merges = graft.llm.Vocab.bpeMerges(df, "text", numMerges = 5)
    val enc = graft.llm.Vocab.bpeEncode(df, "id", "text", merges,
      endOfWord = Some("</w>"))
    // every word contributes exactly one marker subword
    val markers = enc.where($"subword" === "</w>").count()
    val words = df.select(explode(split($"text", " "))).count()
    assert(markers == words, s"$markers markers for $words words")
    val dec = graft.llm.Vocab.bpeDecode(enc, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    df.collect().foreach { r =>
      assert(dec(r.getLong(0)) == r.getString(1),
        s"decode(encode) broke doc ${r.getLong(0)}: '${dec(r.getLong(0))}'")
    }
  }

  test("encode preserves every token occurrence with 0-based positions") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, "x y x")).toDF("id", "text")
    val vocab = graft.llm.Vocab.build(df, "text")
    val got = graft.llm.Vocab.encode(df, "id", "text", vocab)
      .orderBy("pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    // x: freq 2 → id 1; y: freq 1 → id 2
    assert(got == List((7L, 0, 1), (7L, 1, 2), (7L, 2, 1)))
  }
}
