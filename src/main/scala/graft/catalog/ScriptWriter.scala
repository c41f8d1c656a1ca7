package graft.catalog

/** Ordered SQL-script sink: the reference's output document format,
  * byte-for-byte (`ExtractHiveDDL.java:99-135`) — per-database
  * `CREATE DATABASE IF NOT EXISTS` header (plus `USE` in context
  * mode), per-table banner comments and beeline `!sh echo` progress
  * markers, then the CREATE statement and any partition-restore lines.
  *
  * Unlike the reference — whose parallel threads interleave whole
  * table sections nondeterministically through one shared PrintWriter
  * (`ExtractHiveDDL.java:109,125-135`) — sections are assembled
  * per-table and emitted in sorted table order: replay correctness
  * never depended on section order, so determinism is a pure
  * improvement (SURVEY §2.1 notes).
  */
object ScriptWriter {

  /** One table section (`ExtractHiveDDL.java:125-135`). */
  def tableSection(db: String, table: String, createSql: String,
                   partitionLines: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append('\n')
    sb.append("--------------------------------------\n")
    sb.append("-- ").append(table).append('\n')
    sb.append("--------------------------------------\n")
    sb.append("!sh echo \"Creating table: ").append(table).append("...\";\n")
    sb.append(createSql).append('\n')
    if (partitionLines.nonEmpty) {
      sb.append('\n')
      sb.append("!sh echo \"adding partitions: ").append(db).append('.')
        .append(table).append("...\";\n")
      partitionLines.foreach(l => sb.append(l).append('\n'))
    }
    sb.toString
  }

  /** Per-database header (`ExtractHiveDDL.java:101-105`). */
  def databaseHeader(db: String, cfg: ExtractConfig): String =
    if (cfg.useContext) s"CREATE DATABASE IF NOT EXISTS $db;\nUSE $db;\n\n"
    else s"CREATE DATABASE IF NOT EXISTS $db;\n"

  def databaseScript(db: String, cfg: ExtractConfig,
                     tableSections: Seq[String]): String =
    databaseHeader(db, cfg) + tableSections.mkString

  def write(path: java.nio.file.Path, content: String): Unit = {
    Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(path, content)
  }
}
