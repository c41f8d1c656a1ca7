package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession factory for the engine's entry points.
  *
  * One place for the tuning that matters at every scale: shuffle
  * parallelism sized to the executor cores (not the 200 default),
  * AQE on (runtime re-plan of skewed joins / small partitions), UTC
  * session time (oracle parity). No per-table session mutation happens
  * anywhere else — table readers declare their needs via explicit
  * schemas instead (see [[Tables]]).
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // bucketed-table queries (q83) write managed tables; keep the
      // warehouse out of the repo tree
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      // Driver status stores (guide §5: the driver should hold almost
      // no data): Bench/Verify execute ~700 query actions in ONE JVM,
      // and the default retention — 1000 jobs, 1000 stages with task
      // summaries, 1000 SQL executions each carrying its full plan
      // graph + per-operator metrics — accumulates into a multi-GB
      // old-gen live set by mid-suite. The UI is disabled, nothing
      // reads these stores; round-16 measured the tail of the bench
      // suite (q7x–q12x region) at 2–3× its isolated time from
      // exactly this pressure. Retention is slashed to a debugging
      // minimum; production jobs run few queries per driver and are
      // unaffected by these bounds.
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
}

/** Minimal JSON string escaping shared by [[Verify]] and [[Bench]].
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or
  * CR in builder-authored SQL would otherwise break the driver's
  * json.load and silently zero a round's correctness.
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
