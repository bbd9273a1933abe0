package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Key-distribution tools for joins at scale. (The time-based joins —
 * as-of and range — live in [[Temporal]].)
 */
object Joins {

  /**
   * Salted equi-join for SKEWED keys: identical results to
   * `big.join(small, keys, joinType)`, but no single reducer ever owns a
   * hot key's full row set.
   *
   * A plain shuffle join sends every row of a key to ONE partition — a
   * key holding 1% of a 100-TB fact is a 1-TB straggler task (or an OOM).
   * Salting splits each key's big-side rows across `nSalts` partitions
   * (salt = a deterministic hash of `saltBy`, a column unique-ish within
   * a key — an event id, a line number) and replicates each small-side
   * row `nSalts` times (an explode — ×nSalts bytes of the SMALL side,
   * the price of the rebalance). The join then runs on (keys, _salt):
   * every big row still meets every small row of its key exactly once,
   * so inner/left semantics are unchanged — proven row-for-row against
   * the unsalted oracle in the j3 gate.
   *
   * Use when the small side is too big to broadcast AND keys skew.
   * AQE's skew-join handles sort-merge stragglers adaptively at the
   * partition level; explicit salting is the static form that also
   * covers hash joins and extreme single-key skew, and composes with
   * bucketed layouts. Only `inner` and `left` are supported: for right/
   * full joins the replicated small side would emit one unmatched row
   * PER SALT (correctness, not a performance knob — rejected up front).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: String, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, "nSalts must be at least 1")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner/left joins only, not $joinType " +
        "(a replicated small side emits unmatched rows once per salt)")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "column _salt is reserved")
    val b = big.withColumn("_salt", pmod(xxhash64(col(saltBy)), lit(nSalts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0).cast("long"), lit(nSalts - 1).cast("long"))))
    b.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
