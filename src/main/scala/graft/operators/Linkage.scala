package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage primitives (Fellegi & Sunter, JASA 1969): entity
  * resolution across two tables that share no key — the
  * master-data-dedup verb next to the text near-dup family
  * (q28-q30/q104), operating on structured fields instead of content
  * shingles.
  *
  * Scale design (100 TB lens): the quadratic all-pairs comparison is
  * never materialized — candidate pairs come from MULTI-PASS BLOCKING
  * (each pass one equi-join on a cheap deterministic key; a record
  * pair survives if ANY pass agrees), the standard linkage design:
  * recall comes from key diversity (a corruption that breaks one
  * pass's key leaves another intact), cost stays Σ_blocks |A_b|·|B_b|.
  * Pass keys must be chosen with bounded block cardinality (suffix
  * digits, key+category composites); a skewed pass key is the same
  * failure mode as any skewed join key and takes the same mitigations
  * (salting, dropping oversized blocks — standard practice in
  * production linkage).
  */
object Linkage {

  /** Distinct candidate (a_key, b_key) pairs from multi-pass blocking:
    * one equi-join per pass (each a single shuffle on its block key),
    * unioned and deduplicated. `passes` holds (keyA, keyB) block-key
    * expressions evaluated against `a` and `b` respectively.
    */
  def blockedPairs(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                   passes: Seq[(Column, Column)]): DataFrame = {
    require(passes.nonEmpty, "at least one blocking pass")
    passes.map { case (ka, kb) =>
      a.select(col(aKey).as("a_key"), ka.as("__blk"))
        .join(b.select(col(bKey).as("b_key"), kb.as("__blk")), "__blk")
        .select(col("a_key"), col("b_key"))
    }.reduce(_ unionByName _).distinct()
  }
}
