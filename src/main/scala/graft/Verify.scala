package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.local("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    // clean slate: a stale result dir from a previous run must never
    // mask a now-failing query in the compare
    val root = new java.io.File(outDir)
    if (root.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(root)
    }
    root.mkdirs()
    // optional comma-separated name-substring filters for fast local
    // parity iteration (the driver never sets either — full run).
    // ONLY includes; SKIP excludes (scale probes drop the declared-
    // quadratic baselines whose all-pairs shape is O(n²) by design).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val skip = sys.env.get("SPARK_GRAFT_VERIFY_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains)) && !skip.exists(name.contains)
    // optional per-query JVM-heap high-water probe (SPARK_GRAFT_HEAP_PROBE=1):
    // resets every heap pool's peak before a query and records the summed
    // peaks after — at local[N] the one JVM holds driver AND executor state,
    // so this is the number that sizes SPARK_DRIVER_MEM for scale sweeps.
    // GC between queries keeps one query's garbage from inflating the next
    // query's attributed peak (peaks count garbage until collected).
    val heapProbe = sys.env.get("SPARK_GRAFT_HEAP_PROBE").contains("1")
    val heapPeaks = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
      .asInstanceOf[java.util.List[java.lang.management.MemoryPoolMXBean]]
    def resetPeaks(): Unit = pools.forEach { p =>
      if (p.getType == java.lang.management.MemoryType.HEAP) p.resetPeakUsage()
    }
    def peakMb(): Long = {
      var s = 0L
      pools.forEach { p =>
        if (p.getType == java.lang.management.MemoryType.HEAP)
          s += p.getPeakUsage.getUsed
      }
      s / (1024 * 1024)
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        if (heapProbe) { System.gc(); resetPeaks() }
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        if (heapProbe) heapPeaks(name) = peakMb()
      }
    }
    if (heapProbe) {
      val hj = heapPeaks.map { case (k, v) => s"${Json.quote(k)}:$v" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/heap_peaks_mb.json"), hj)
      heapPeaks.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
        System.err.println(f"[heap] $k%-40s $v%6d MB peak") }
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${Json.quote(k)}: ${Json.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
