package graft.catalog

import graft.Sessions
import org.apache.spark.sql.SparkSession

/** Hive-enabled local session factory.
  *
  * Where the reference opens raw Thrift channels to a metastore daemon
  * and HiveServer2 (`HiveClientFactory.java:31`, `HiveClient.java:61-72`),
  * Spark SQL *is* a metastore client: `enableHiveSupport()` backs
  * `spark.catalog` / `sessionState.catalog` with a Hive metastore
  * (embedded Derby locally, a remote metastore on a cluster via
  * hive-site.xml — no engine code changes either way).
  *
  * `baseDir` isolates the Derby database + warehouse under one
  * directory, so tests and CLI runs never share metastore state.
  */
object HiveSessions {
  def local(appName: String, baseDir: Option[String] = None): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[${Sessions.cpus}]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", Sessions.cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
    baseDir.foreach { d =>
      b.config("spark.sql.warehouse.dir", s"$d/warehouse")
        .config(
          "spark.hadoop.javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$d/metastore_db;create=true")
    }
    b.getOrCreate()
  }
}
