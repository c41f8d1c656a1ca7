package graft

import org.apache.spark.sql.functions._

// temporary timing probe — not part of the library; deleted after use
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.llm.VectorSearch
    VectorSearch.sq8IvfRerank(e, "vec_id", "embedding", "label").count() // warm
    time("pk_codes_first")(VectorSearch.packedSignCodes(e, "vec_id", "embedding").count())
    time("pk_assign")(VectorSearch.ivfAssign(e, "vec_id", "embedding", "label", 2).count())
    // replicate the helper's stages by hand to see where first-run time goes
    val codesM = VectorSearch.packedSignCodes(e, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("codesM_count")(codesM.count())
    val assign = VectorSearch.ivfAssign(e, "vec_id", "embedding", "label", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("assign_count")(assign.count())
    val salts = math.max(1, spark.sessionState.conf.numShufflePartitions / 2)
    val probed = assign.select(col("vec_id").as("va"), col("list_id"))
      .join(codesM.select(col("vec_id").as("va"), col("code").as("ca")), "va")
      .withColumn("salt", pmod(hash(col("va")), lit(salts)))
    val home = assign.where(col("rn") === 1)
      .select(col("vec_id").as("vb"), col("list_id"))
      .join(codesM.select(col("vec_id").as("vb"), col("code").as("cb")), "vb")
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val pairs = probed.join(home, Seq("list_id", "salt"))
      .where(col("va") =!= col("vb"))
      .withColumn("score", -expr("CAST(bit_count(ca ^ cb) AS DOUBLE)"))
    time("pairs_count")(pairs.count())
    val cand = pairs
      .groupBy(col("va"))
      .agg(expr("topk_neighbors(vb, score, 10)").as("top"))
      .select(col("va"), explode(col("top")).as("n"))
      .select(col("va"), col("n.vb").as("vb"))
    time("cand_count")(cand.count())
    time("rerank")(VectorSearch.exactRerank(e, "vec_id", "embedding", cand, 3).count())
    spark.stop()
  }
}
