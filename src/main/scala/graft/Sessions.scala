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
