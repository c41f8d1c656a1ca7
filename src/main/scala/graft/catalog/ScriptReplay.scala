package graft.catalog

import org.apache.spark.sql.SparkSession

/** Replays an extracted DDL script against a Spark session — the
  * consumer side of the reference's workflow (its scripts were replayed
  * with beeline, `README.md:2-4`; beeline's `!sh` escapes and `--`
  * comments are skipped here the same way beeline treats them as
  * non-SQL).
  *
  * Statement boundaries are `;` at end of line — the exact shape
  * [[ScriptWriter]] emits (a literal `;` followed by a newline inside a
  * quoted value would mis-split; the writer never produces one on its
  * own lines).
  */
object ScriptReplay {

  def statements(script: String): Seq[String] =
    script.linesIterator
      .filterNot(_.trim.startsWith("--"))
      .filterNot(_.trim.startsWith("!"))
      .mkString("\n")
      .split(";\\s*(\n|$)")
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Execute every statement in order; returns the statement count. */
  def replay(spark: SparkSession, script: String): Int = {
    val stmts = statements(script)
    stmts.foreach(s => spark.sql(s).collect())
    stmts.size
  }
}
