package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Partition-restore planning: the MSCK-vs-ADD decision table and the
  * partition statement formatting
  * (`ExtractHiveDDL.java:199-276`, `README.md:30-49`).
  *
  * Semantics preserved exactly:
  *  - a `__HIVE_DEFAULT_PARTITION__` value forces MSCK (ADD PARTITION
  *    would fail — it's a Hive keyword);
  *  - a non-lowercase character in any *relative* partition location
  *    forces ADD PARTITION (MSCK missed such paths in the reference's
  *    environment);
  *  - both at once is an error (`ExtractHiveDDL.java:231-232`);
  *  - otherwise the `useAddSql` config default applies.
  *
  * Differences from the reference, by design (SURVEY §2.1 #12/#13):
  * partition spec + location come from one `CatalogTablePartition`
  * (no zip-by-index over two RPC lists), values are quote-escaped, the
  * 32767-partition cap is lifted, and ADD lines are emitted in sorted
  * partition order for deterministic scripts.
  */
object PartitionRestore {

  sealed trait Strategy
  case object UseMsck extends Strategy
  case object UseAddPartitionSql extends Strategy

  /** `ExtractHiveDDL.java:231-232` throws when both overrides apply. */
  final case class PartitionConflictException(table: String) extends RuntimeException(
    s"Table ${table}has default partition and non-lower case chars")

  val DefaultPartitionValue = "__HIVE_DEFAULT_PARTITION__"

  /** The decision table (`ExtractHiveDDL.java:205,229-235`). */
  def decide(hasDefaultPartition: Boolean, hasNonLowercase: Boolean,
             useAddSqlDefault: Boolean, table: String): Strategy = {
    if (hasDefaultPartition && hasNonLowercase) throw PartitionConflictException(table)
    if (hasDefaultPartition) UseMsck
    else if (hasNonLowercase) UseAddPartitionSql
    else if (useAddSqlDefault) UseAddPartitionSql
    else UseMsck
  }

  /** `(k1='v1',k2='v2')` from an ordered spec; values quote-escaped
    * (the reference's raw string surgery breaks on `'` — documented
    * deviation, SURVEY §7.3 hard part 4).
    */
  def specSql(spec: Seq[(String, String)]): String =
    spec.map { case (k, v) => s"$k='${v.replace("'", "\\'")}'" }
      .mkString("(", ",", ")")

  /** Reference-compatible transform of a partition *name* string
    * (`k1=v1/k2=v2` → `k1='v1',k2='v2'`), the exact `replaceAll` pair
    * from `ExtractHiveDDL.java:263-265`; kept for parity tests against
    * metastore-formatted names.
    */
  def specSqlFromPartitionName(partitionName: String): String = {
    val quoted = partitionName.replaceAll("=", "='") + "'"
    quoted.replaceAll("/", "',")
  }

  def msckSql(db: String, table: String, cfg: ExtractConfig): String =
    if (cfg.useContext) s"MSCK REPAIR TABLE $table;"
    else s"MSCK REPAIR TABLE $db.$table;"

  /** `ALTER TABLE ... ADD PARTITION (...) LOCATION "...";`
    * (`ExtractHiveDDL.java:263-276`): location relative to the table
    * root in context mode, absolute otherwise; double-quoted as in the
    * reference.
    */
  def addPartitionSql(db: String, table: String, tableRootSlash: String,
                      spec: Seq[(String, String)], location: String,
                      cfg: ExtractConfig): String = {
    val tName = if (cfg.useContext) table else s"$db.$table"
    val pLoc =
      if (cfg.useContext) "\"" + location.replace(tableRootSlash, "") + "\""
      else "\"" + location + "\""
    s"ALTER TABLE $tName ADD PARTITION ${specSql(spec)} LOCATION $pLoc;"
  }

  /** Restore statements for one table: empty for unpartitioned tables
    * (`ExtractHiveDDL.java:200-203`), one MSCK line, or N sorted ADD
    * PARTITION lines. Reads `CatalogTablePartition`s from the session
    * catalog — spec and location in one object, no ordering assumption.
    */
  def restoreLines(spark: SparkSession, db: String, table: String,
                   cfg: ExtractConfig): Seq[String] = {
    val cat = spark.sessionState.catalog
    val ident = TableIdentifier(table, Some(db))
    val tmeta = cat.getTableMetadata(ident)
    // Hive's listPartitions throws on unpartitioned tables (the
    // reference's listPartitionNames returned [] — ExtractHiveDDL.java:200-203)
    if (tmeta.partitionColumnNames.isEmpty) return Seq.empty
    val parts = cat.listPartitions(ident)
    if (parts.isEmpty) return Seq.empty

    val tableRootSlash = tmeta.location.toString.stripSuffix("/") + "/"
    val pcols = tmeta.partitionColumnNames

    val hasDefaultPartition =
      parts.exists(_.spec.values.exists(_ == DefaultPartitionValue))
    // Reference checks the *relative* location (table root stripped) for
    // uppercase chars. Deviation (bug fix): the default-partition marker
    // itself is uppercase and appears in its partition's path, so the
    // reference's literal check (ExtractHiveDDL.java:219-228) flags every
    // default-partition table as non-lowercase too and then always throws
    // at :231-232 — contradicting README.md:39-41 (default → MSCK). The
    // marker is masked before the case check so the two conditions stay
    // independent, as the README documents.
    val hasNonLowercase = parts.exists { p =>
      val rel = p.location.toString.replace(tableRootSlash, "")
        .replace(DefaultPartitionValue, "")
      rel.toLowerCase != rel
    }

    decide(hasDefaultPartition, hasNonLowercase, cfg.useAddSql, table) match {
      case UseMsck => Seq(msckSql(db, table, cfg))
      case UseAddPartitionSql =>
        parts.map { p =>
          val spec = pcols.map(c => c -> p.spec(c))
          (spec.map(_._2), addPartitionSql(db, table, tableRootSlash, spec,
            p.location.toString, cfg))
        }.sortBy(_._1.mkString("/")).map(_._2)
    }
  }
}
