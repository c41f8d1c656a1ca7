package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based PII redaction — the scrubbing pass a training-data
  * pipeline runs before anything else sees the text. Each rule is
  * (name, regex, replacement); rules apply IN ORDER (an email must be
  * masked as one `[EMAIL]`, not first have its digit run turned into
  * `[NUM]`), entirely in-row via codegen'd `regexp_replace` /
  * `regexp_count` — no shuffle, no UDF, linear scans at any scale.
  *
  * Patterns stay inside the regex subset shared by Java's engine and
  * RE2 (no lookbehind/backrefs) so the oracle replays them verbatim;
  * Spark's `regexp_replace` is global by default, DuckDB needs the
  * `'g'` flag.
  */
object Redact {

  /** Default ruleset: phone-shaped digit groups, emails, then leftover
    * long digit runs (order matters — see scaladoc). */
  val piiRules: Seq[(String, String, String)] = Seq(
    ("phone", "\\d{2}-\\d{3}-\\d{4}", "[PHONE]"),
    ("email", "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
    ("num", "\\d{4,}", "[NUM]"))

  /** Adds `redacted` plus one `n_<rule>` match-count column per rule.
    * Counts are taken against the text as each rule sees it (after
    * earlier rules ran), matching what was actually replaced. */
  def redact(df: DataFrame, textCol: String,
             rules: Seq[(String, String, String)] = piiRules): DataFrame = {
    val seeded = df.withColumn("redacted", col(textCol))
    rules.foldLeft(seeded) { case (d, (name, pattern, repl)) =>
      d.withColumn(s"n_$name", regexp_count(col("redacted"), lit(pattern)))
        .withColumn("redacted", regexp_replace(col("redacted"), pattern, repl))
    }
  }
}
