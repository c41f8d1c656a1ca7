package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR.
  *
  * Measurement rules (per round-1 verdict):
  *   - materialize with the `noop` sink, which consumes every output
  *     row/column — `.count()` let Catalyst prune projections and drop
  *     sorts, under-measuring string/window queries;
  *   - one warm-up query outside all timings (session + codegen + JIT
  *     + parquet footer cache);
  *   - failures are NOT swallowed into a green number: a failed query
  *     reports -1 and lands in the "errors" array;
  *   - the JSON line is printed AND written to a file
  *     (SPARK_GRAFT_BENCH_OUT, default ./BENCH_OUT.json) so the driver
  *     never has to fish it out of sbt log noise.
  */
object Bench {
  def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: batch path (session/codegen/JIT/footers) and streaming
    // path (state-store + micro-batch machinery one-time init)
    materialize(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    materialize(SparkEntry.queries("q40_stream_daily_window")(spark, sfDir))

    // per-query state cleanup so accumulated caches / memory-sink
    // tables from earlier queries don't tax later timings
    def resetState(): Unit = {
      // SQL-level cache entries first (CacheManager holds references
      // that keep InMemoryRelations alive even after the RDD-level
      // unpersist below), then any remaining persistent RDDs —
      // BLOCKING, so a queued async unpersist can't overlap the next
      // query's timed region (round-15 found the q16x–q20x bench
      // region reading ~3× its isolated time from exactly this
      // accumulated debris)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      // broadcast blocks are only reclaimed when their driver-side
      // handles are GC'd (ContextCleaner is reference-triggered);
      // dozens of broadcast-heavy queries in one JVM otherwise
      // accumulate old-gen pressure that taxes later timings
      System.gc()
    }

    // three trials per query, report the min: a single run is hostage
    // to transient machine load (a round-2 "regression" was exactly
    // such an artifact, and the r5/r6 artifacts both shipped with a
    // uniform whole-run load drift) — min-of-3 is the cheapest defense
    // that holds when the artifact run can't be guaranteed idle
    val trials = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt)
    // optional comma-separated name filter for single-query iteration;
    // unset (the driver's mode) = run everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // optional exact-name exclusion for the sf1 scale sweep, where the
    // declared-quadratic all-pairs baselines are excluded by design
    // (same set as SPARK_GRAFT_VERIFY_SKIP, see the verify skill)
    val skipped = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // the queries whose r4/r5 artifacts swung hardest under machine
    // load get one extra trial: min-of-3 keeps a single contended run
    // from minting a phantom regression in the per-round artifact
    val noiseProne = Set("q82_pagerank_supply", "q54_neardup_clusters",
      "q31_cosine_knn", "q28_ngram_jaccard_neardup",
      "q69_stream_stream_join", "q102_column_profile")
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) && !skipped(name) }
      .map { case (name, fn) =>
      val qTrials = if (noiseProne(name)) math.max(trials, 3) else trials
      val times = (1 to qTrials).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            errors += s"$name: ${e.toString.take(300)}"; false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        resetState()
        if (ok) dt else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"${Json.quote(k)}:$v" }
      .mkString("{", ",", "}")
    val errJson = errors.map(Json.quote).mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":${Json.quote(sfDir)}}"""
    println(json)
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")), json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
