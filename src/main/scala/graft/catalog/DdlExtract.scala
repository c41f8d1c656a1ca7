package graft.catalog

import org.apache.spark.sql.SparkSession
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** Full extraction pipeline (`ExtractHiveDDL.main`, `ExtractHiveDDL.java:34-135`):
  * enumerate databases by pattern → per database, enumerate tables →
  * per table (in parallel), fetch CREATE DDL + plan partition restore →
  * assemble the ordered script.
  *
  * The per-table fan-out mirrors the reference's ForkJoinPool at
  * parallelism 8 (`ExtractHiveDDL.java:109`, `extract_hive_ddl.sh:25`)
  * with a fixed thread pool; Spark SQL catalog commands are
  * thread-safe per session. Results are assembled in sorted table
  * order after the parallel fetch, so output is deterministic where
  * the reference's interleaved PrintWriter was not.
  *
  * Error semantics: the reference prints per-table errors and emits
  * `null` into the script (`ExtractHiveDDL.java:171-174`); here a
  * failed table becomes an explicit `-- ERROR ...` comment section and
  * the run continues (documented deviation, SURVEY §2.1 notes).
  *
  * Scale note: per-table work is catalog-RPC-bound, not data-bound —
  * the right distribution unit is driver threads against the
  * metastore, exactly like the reference. For catalogs with millions
  * of tables the listing itself becomes a `Dataset[TableRef]` and the
  * fan-out becomes Spark tasks (SURVEY §1.2); at test scale that
  * machinery would only add scheduling overhead.
  */
object DdlExtract {

  final case class TableReport(db: String, table: String, error: Option[String])

  final case class ExtractResult(script: String, databases: Seq[String],
                                 reports: Seq[TableReport]) {
    def tableCount: Int = reports.size
    def errorCount: Int = reports.count(_.error.nonEmpty)
  }

  def tableSection(spark: SparkSession, db: String, table: String,
                   cfg: ExtractConfig): (String, TableReport) =
    Try {
      val createSql = DdlExtractor.tableCreateSql(spark, db, table)
      val partLines = PartitionRestore.restoreLines(spark, db, table, cfg)
      ScriptWriter.tableSection(db, table, createSql, partLines)
    } match {
      case Success(section) => (section, TableReport(db, table, None))
      case Failure(e) =>
        val msg = e.getMessage
        val section = s"\n-- ERROR extracting $db.$table: ${Option(msg).getOrElse(e.toString).linesIterator.mkString(" ")}\n"
        (section, TableReport(db, table, Some(e.toString)))
    }

  def extract(spark: SparkSession, dbPattern: String, tablePattern: String,
              cfg: ExtractConfig, parallelism: Int = 8): ExtractResult = {
    val dbs = CatalogOps.listDatabases(spark, dbPattern)
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val perDb = dbs.map { db =>
        val tables = CatalogOps.listTables(spark, db, tablePattern)
        val futures = tables.map(t => Future(tableSection(spark, db, t, cfg)))
        val sections = Await.result(Future.sequence(futures), Duration.Inf)
        (ScriptWriter.databaseScript(db, cfg, sections.map(_._1)),
          sections.map(_._2))
      }
      ExtractResult(perDb.map(_._1).mkString, dbs, perDb.flatMap(_._2))
    } finally pool.shutdown()
  }

  def extractToFile(spark: SparkSession, dbPattern: String, tablePattern: String,
                    outFile: java.nio.file.Path, cfg: ExtractConfig): ExtractResult = {
    val result = extract(spark, dbPattern, tablePattern, cfg)
    ScriptWriter.write(outFile, result.script)
    result
  }
}
