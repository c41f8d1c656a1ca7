package graft.catalog

import org.apache.spark.sql.SparkSession
import scala.util.Try

/** Catalog enumeration by pattern — the reference's two "sources"
  * (`ExtractHiveDDL.java:58` getDatabases, `:141-149` getTableNames).
  *
  * Patterns use the Hive metastore glob convention (`*` = any chars,
  * `|` = alternation), which `SHOW DATABASES/TABLES LIKE` implements
  * natively — the predicate is evaluated *inside* the catalog, not as
  * a client-side post-filter, exactly like the reference pushes its
  * patterns into the metastore RPC.
  *
  * Listings are returned sorted: the reference's output order was
  * nondeterministic under its thread fan-out (`ExtractHiveDDL.java:109`);
  * deterministic order is a documented improvement (SURVEY §2.1 notes).
  */
object CatalogOps {
  private def quotePattern(p: String): String = "'" + p.replace("'", "''") + "'"

  def listDatabases(spark: SparkSession, pattern: String): Seq[String] =
    spark.sql(s"SHOW DATABASES LIKE ${quotePattern(pattern)}")
      .collect().map(_.getString(0)).toSeq.sorted

  /** Error → empty list, preserving `ExtractHiveDDL.java:141-149`
    * (a bad database yields no tables, not a failed run).
    * Temp views are excluded — the reference enumerates metastore
    * tables only.
    */
  def listTables(spark: SparkSession, db: String, pattern: String): Seq[String] =
    Try {
      spark.sql(s"SHOW TABLES IN `$db` LIKE ${quotePattern(pattern)}")
        .where("NOT isTemporary")
        .collect().map(_.getString(1)).toSeq.sorted
    }.getOrElse(Seq.empty)

  /** Progress pre-pass (`ExtractHiveDDL.java:60-61`): total table count. */
  def countTables(spark: SparkSession, dbNames: Seq[String], tablePattern: String): Int =
    dbNames.map(listTables(spark, _, tablePattern).size).sum
}
