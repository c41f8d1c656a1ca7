package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The typed UDAF must compute exactly the signature the declarative
  * (crossJoin + groupBy-min) MinHash pipeline computes.
  */
class MinHashAggregatorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.hive

  test("reduce/merge equal the reference affine-min formula") {
    val agg = new MinHashAggregator(4)
    val xs = Seq(17L, 42L, 9999999L)
    val viaReduce = xs.foldLeft(agg.zero)(agg.reduce)
    val P = PolyHash.Mod
    val expected = (0 until 4).map { i =>
      val a = (i.toLong * 7919 + 1) % P; val b = (i.toLong * 104729 + 12345) % P
      xs.map(x => (a * x + b) % P).min
    }
    assert(viaReduce.toSeq == expected)
    // merge = element-wise min, associative with a split stream
    val (l, r) = xs.splitAt(1)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == expected)
  }

  test("distributed one-pass signatures equal the declarative q29 signatures") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.ensureRegistered(s)
    val sfDir = "/root/testdata/sf0.001"
    // declarative path (q29's shape): explode params × hashes, group-min
    val sh = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")).as("shingle"))
      .select(col("doc_id"), expr("poly_hash(shingle)").as("x"))
    val P = PolyHash.Mod
    val params = s.range(12).select(col("id").cast("int").as("i"),
      ((col("id") * 7919 + 1) % P).as("a"), ((col("id") * 104729 + 12345) % P).as("b"))
    val declarative = sh.crossJoin(broadcast(params))
      .groupBy(col("doc_id"), col("i"))
      .agg(min((col("a") * col("x") + col("b")) % P).as("mh"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(i, mh))), s -> s.mh)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // one-pass UDAF path
    val minhashUdaf = udaf(new MinHashAggregator(12))
    val onePass = sh.groupBy(col("doc_id")).agg(minhashUdaf(col("x")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(onePass.keySet == declarative.keySet)
    declarative.foreach { case (id, sig) => assert(onePass(id) == sig, s"doc $id") }
  }
}
