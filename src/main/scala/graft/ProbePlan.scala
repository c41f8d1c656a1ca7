package graft

/** Scratch plan/timing probe (temporary, not part of the contract). */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = Sessions.local("graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"ROWS $n in ${(System.nanoTime() - t0) / 1e9} s")
  }
}
