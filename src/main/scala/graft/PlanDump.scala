package graft

import java.nio.file.{Files, Paths}

/** Plan-capture tool for the optimization rounds: writes each named
  * query's `.explain("formatted")` output to `<outDir>/<name>.txt`.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <q1,q2,...>
  * Not part of the driver contract — a measurement aid (guide §1.5).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = Sessions.local("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$n.txt"), plan)
      println(s"wrote $outDir/$n.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
