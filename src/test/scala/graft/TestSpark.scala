package graft

import org.apache.spark.sql.SparkSession

/** One shared Hive-enabled session for every metastore-touching suite.
  *
  * All ScalaTest suites run in the single forked test JVM
  * (`Test / fork := true`), so one embedded-Derby metastore under a
  * fresh temp dir serves them all — Derby allows only one process, and
  * a unique directory per JVM keeps runs isolated (SURVEY §7.3 hard
  * part 2).
  */
object TestSpark {
  lazy val baseDir: String =
    java.nio.file.Files.createTempDirectory("graft-test-hive").toString

  lazy val hive: SparkSession = {
    val s = catalog.HiveSessions.local("graft-test", Some(baseDir))
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
