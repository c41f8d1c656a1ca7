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
  * production linkage). [[blockedPairsCapped]] is that guard: a
  * per-block pair budget with the dropped blocks reported, not
  * silently discarded.
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

  /** [[blockedPairs]] with the block-cardinality guard a skewed pass
    * key needs at scale: any block whose pair count `n_a · n_b`
    * exceeds `maxBlockPairs` is DROPPED from that pass — and, per the
    * no-silent-caps rule, REPORTED in the second returned DataFrame
    * `(pass, __blk, n_a, n_b)` so the caller sees exactly which keys
    * were capped and how many comparisons each avoided. A hot block
    * key (empty string, a default date, "UNKNOWN") otherwise makes
    * one pass quadratic in its frequency — the q176 sf1 superlinear
    * signature — while contributing almost no discriminating power:
    * a block where thousands of records agree on the key is, by that
    * fact, a key that does not distinguish them. Multi-pass recall
    * still applies: a pair lost to one pass's oversized block
    * survives in any other pass whose block stays under the cap.
    *
    * Cost: two per-pass count aggregations (narrow key-count rows)
    * and one broadcast anti-join against the (small) oversized-key
    * set per side — O(|A|+|B|) per pass, versus the unbounded
    * Σ_blocks |A_b|·|B_b| it prevents. With no oversized blocks the
    * pair set is IDENTICAL to [[blockedPairs]] (suite-pinned).
    */
  def blockedPairsCapped(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                         passes: Seq[(Column, Column)],
                         maxBlockPairs: Long): (DataFrame, DataFrame) = {
    require(passes.nonEmpty, "at least one blocking pass")
    require(maxBlockPairs >= 1, "maxBlockPairs must be positive")
    val perPass = passes.zipWithIndex.map { case ((ka, kb), i) =>
      val aa = a.select(col(aKey).as("a_key"), ka.as("__blk"))
      val bb = b.select(col(bKey).as("b_key"), kb.as("__blk"))
      val over = aa.groupBy(col("__blk")).agg(count(lit(1)).as("n_a"))
        .join(bb.groupBy(col("__blk")).agg(count(lit(1)).as("n_b")), "__blk")
        .where(col("n_a") * col("n_b") > maxBlockPairs)
        .select(lit(i).as("pass"), col("__blk").cast("string").as("__blk"),
          col("n_a"), col("n_b"))
      val overKeys = over.select(col("__blk").as("__over_blk"))
      val pairs = aa
        .join(broadcast(overKeys),
          aa("__blk").cast("string") === col("__over_blk"), "left_anti")
        .join(bb, "__blk")
        .select(col("a_key"), col("b_key"))
      (pairs, over)
    }
    (perPass.map(_._1).reduce(_ unionByName _).distinct(),
      perPass.map(_._2).reduce(_ unionByName _))
  }
}
