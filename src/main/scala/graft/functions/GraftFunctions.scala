package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.expr

/** Registration of the engine's native expressions.
  *
  * Two paths, same builder:
  *  - [[GraftExtensions]] via `SparkSession.builder.withExtensions` —
  *    the library-integration path (`spark.sql.extensions` on a
  *    cluster);
  *  - [[GraftFunctions.ensureRegistered]] — per-session programmatic
  *    registration, so queries work on any caller-provided session
  *    (the driver contract passes us its own).
  */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> (children => PolyHash(children.head)),
    "vector_dot_scaled" -> (children => VectorDotScaled(children(0), children(1))),
    "long_vector_dot" -> (children => LongVectorDot(children(0), children(1))),
    "long_vector_l2" -> (children => LongVectorL2(children(0), children(1))),
    "long_vector_eq_count" -> (children => LongVectorEqCount(children(0), children(1))),
    "decimal_l2" -> (children => DecimalL2(children(0), children(1))),
    "winnow_stats" -> (children => WinnowStats(children.head,
      children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])),
    "winnow_set" -> (children => WinnowSet(children.head,
      children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])),
    "topk_neighbors" -> (children => TopKNeighborsAgg(children(0), children(1),
      children(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "shingle_hashes" -> (children => ShingleHashes(children(0),
      children(1).eval().asInstanceOf[Int])),
    "gram_stats" -> (children => GramStats(children(0),
      children(1).eval().asInstanceOf[Int])),
    "simhash_fp" -> (children => SimHashFp(children(0),
      children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])),
    "minhash_sig" -> (children => MinHashSig(children(0),
      children(1).eval().asInstanceOf[Int])),
    "bloom_build" -> (children => BloomBuildAgg(children(0),
      children(1).eval().asInstanceOf[Int],
      children(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "bloom_contains" -> (children => BloomMightContain(children(0), children(1),
      children(2).eval().asInstanceOf[Int])),
    "freq_candidates" -> (children => FreqItemsAgg(children(0),
      children(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    "qdigest_sketch" -> (children => QDigestSketchAgg(children(0),
      children(1).eval().asInstanceOf[Int],
      children(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "qdigest_merge" -> (children => QDigestMergeAgg(children(0),
      children(1).eval().asInstanceOf[Int],
      children(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "cdc_chunk_hashes" -> (children => CdcChunkHashes(children(0),
      children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])),
    "multi_needle_count" -> (children => MultiNeedleCount(children(0), children(1))),
    "unigram_segment" -> (children => UnigramViterbi(children(0),
      children(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString),
      children(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      children(3).eval().asInstanceOf[Int])),
    // arity-checked: children.head would silently IGNORE extra
    // arguments (nfc_normalize('a','b') passing analysis), unlike the
    // sibling children(i) entries which at least fail on missing ones
    "nfc_normalize" -> (children => children match {
      case Seq(c) => NfcNormalize(c)
      case _ => throw new IllegalArgumentException(
        s"nfc_normalize expects exactly 1 argument, got ${children.length}")
    }),
    "packed_sign_word" -> (children => PackedSignWord(children(0),
      children(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      children(2).eval().asInstanceOf[Long],
      children(3).eval().asInstanceOf[Int],
      children(4).eval().asInstanceOf[Int])))

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** `poly_hash` over a SQL expression string, as a Column. */
  def polyHash(sqlExpr: String): Column = expr(s"poly_hash($sqlExpr)")
}

/** `spark.sql.extensions`-compatible installer. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vector_dot_scaled"),
      new ExpressionInfo(classOf[VectorDotScaled].getName, "vector_dot_scaled"),
      (children: Seq[Expression]) => VectorDotScaled(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("long_vector_dot"),
      new ExpressionInfo(classOf[LongVectorDot].getName, "long_vector_dot"),
      (children: Seq[Expression]) => LongVectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("long_vector_l2"),
      new ExpressionInfo(classOf[LongVectorL2].getName, "long_vector_l2"),
      (children: Seq[Expression]) => LongVectorL2(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("long_vector_eq_count"),
      new ExpressionInfo(classOf[LongVectorEqCount].getName, "long_vector_eq_count"),
      (children: Seq[Expression]) => LongVectorEqCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("decimal_l2"),
      new ExpressionInfo(classOf[DecimalL2].getName, "decimal_l2"),
      (children: Seq[Expression]) => DecimalL2(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("multi_needle_count"),
      new ExpressionInfo(classOf[MultiNeedleCount].getName, "multi_needle_count"),
      (children: Seq[Expression]) => MultiNeedleCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    // the custom as-of planner operator (graft.plans.AsOfJoinPlan);
    // AsOf.join also self-registers via experimental.extraStrategies
    // for sessions built without spark.sql.extensions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
