package graft.llm

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Parameterized similarity-search operators over any embedding corpus
  * — the library API behind q31/q32/q33/q47. Vectors are
  * `array<float>`; all cosines come from the exact scaled-long dot
  * product ([[graft.functions.VectorDotScaled]]), so results are
  * deterministic and engine-portable.
  */
object VectorSearch {

  private def dot(c1: String, c2: String): String =
    s"cast(vector_dot_scaled($c1, $c2) as double) / 1e12"

  /** Adds an exact L2 norm column. */
  def withNorm(df: DataFrame, vecCol: String, normCol: String = "nrm"): DataFrame = {
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(normCol, sqrt(expr(dot(vecCol, vecCol))))
  }

  /** Exact brute-force cosine top-k per vector via the bounded-heap
    * native aggregate. Output: va, rn, vb, cos. Quadratic by
    * definition — the baseline; use [[annTopK]] at scale.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val e = withNorm(df, vecCol)
    val a = e.select(col(idCol).as("va"), col(vecCol).as("ea"), col("nrm").as("na"))
    val b = e.select(col(idCol).as("vb"), col(vecCol).as("eb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("va") =!= col("vb"))
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
      .groupBy(col("va"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("vb"), col("n.cos").as("cos"))
  }

  /** Deterministic pseudo-random hyperplane coefficient for (j, i). */
  private def planeVal: String =
    "(((CAST(1103515245 AS BIGINT) * (j * 64 + i) + 12345) % 2147483648) / 1073741824.0 - 1.0)"

  /** Random-hyperplane LSH bucket ids: sign pattern of `planes`
    * projections (scaled-long exact folds). Output: idCol, vecCol,
    * nrm, bucket.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 planes: Int = 4, dim: Int = 64): DataFrame = {
    val e = withNorm(df, vecCol)
    e.select(col(idCol), col(vecCol), col("nrm"),
        explode(expr(s"sequence(0, ${planes - 1})")).as("j"))
      .withColumn("s", expr(
        s"""aggregate(sequence(0, ${dim - 1}), cast(0 as bigint), (acc, i) ->
           |  acc + cast(round(cast($vecCol[i] as double) * $planeVal * 1e12) as bigint))""".stripMargin))
      .groupBy(col(idCol))
      .agg(sum(expr("if(s > 0, cast(1 as bigint) << j, 0)")).as("bucket"),
        first(col(vecCol)).as(vecCol), first(col("nrm")).as("nrm"))
  }

  /** Within-bucket pairs with cosine, the shared core of ANN top-k and
    * threshold search. `pairFilter` narrows the raw (va, vb) pair set.
    */
  private def bucketPairs(bucketed: DataFrame, idCol: String, vecCol: String,
                          pairFilter: Column): DataFrame = {
    val a = bucketed.select(col("bucket"), col(idCol).as("va"),
      col(vecCol).as("ea"), col("nrm").as("na"))
    val b = bucketed.select(col("bucket"), col(idCol).as("vb"),
      col(vecCol).as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).where(pairFilter)
      .withColumn("cos", expr(dot("ea", "eb")) / (col("na") * col("nb")))
  }

  /** Approximate top-k: exact search within each LSH bucket.
    * Output: va, bucket, rn, nn, cos. Singleton-bucket vectors yield
    * no rows (recall trade-off; multi-probe = union over plane sets).
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              planes: Int = 4, dim: Int = 64): DataFrame =
    bucketPairs(lshBuckets(df, idCol, vecCol, planes, dim), idCol, vecCol,
      col("va") =!= col("vb"))
      .groupBy(col("va"), col("bucket"))
      .agg(expr(s"topk_neighbors(vb, cos, $k)").as("top"))
      .select(col("va"), col("bucket").cast("long").as("bucket"),
        posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("va"), col("bucket"), (col("pos") + 1).cast("int").as("rn"),
        col("n.vb").as("nn"), col("n.cos").as("cos"))

  /** Embedding near-dup pairs: within-bucket pairs over a cosine
    * threshold. Output: va, vb, cos (va < vb).
    */
  def thresholdPairs(df: DataFrame, idCol: String, vecCol: String,
                     minCos: Double, planes: Int = 4, dim: Int = 64): DataFrame =
    bucketPairs(lshBuckets(df, idCol, vecCol, planes, dim), idCol, vecCol,
      col("va") < col("vb"))
      .where(col("cos") >= minCos)
      .select(col("va"), col("vb"), col("cos"))

  /** Per-label centroids + cohesion (the IVF coarse quantizer).
    * Output: label, n_vectors, avg_dist.
    */
  def labelCentroids(df: DataFrame, idCol: String, vecCol: String,
                     labelCol: String): DataFrame = {
    val dims = df.select(col(idCol), col(labelCol),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .withColumn("x", col("x").cast("double"))
    val centroids = dims.groupBy(col(labelCol), col("i"))
      .agg((sum(col("x").cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as("c"))
    val dist = dims.join(centroids, Seq(labelCol, "i"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sqrt(sum(expr("cast((x - c) * (x - c) as decimal(38,12))"))
        .cast("double")).as("d"))
    dist.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(col("d").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("avg_dist"))
  }
}
