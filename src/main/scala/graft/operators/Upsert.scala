package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Idempotent upsert / CDC merge, re-expressing the reference's
 * `INSERT ... ON CONFLICT (hash_key) DO UPDATE SET ... COALESCE(EXCLUDED.x,
 * old.x)` staging upsert (reference: services/normalizer/db_operations.py:334)
 * as a declarative batch merge:
 *
 *  1. collapse each side to one latest row per key (window row_number — a
 *     single shuffle on the key);
 *  2. full-outer join base-state with delta-state on the key;
 *  3. delta wins (`EXCLUDED`-semantics) via coalesce(delta, base), and
 *     first/last-seen are the min/max across both sides.
 *
 * At 100 TB the base side is the big one: bucketing the stored state by the
 * merge key makes the daily merge a co-located join with no re-shuffle of
 * the base (SURVEY.md §5).
 */
object Upsert {

  /** One row per key: the latest by (tsCol desc, tiebreak desc), plus
    * first/last-seen timestamps computed over the whole group. */
  def latestState(df: DataFrame, key: String, tsCol: String, tiebreak: String,
      payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).desc, col(tiebreak).desc)
    val ranked = df.withColumn("__rn", row_number().over(w))
      .withColumn("__first_seen", min(tsCol).over(Window.partitionBy(key)))
      .withColumn("__last_seen", max(tsCol).over(Window.partitionBy(key)))
    ranked.filter(col("__rn") === 1)
      .select((Seq(col(key), col("__first_seen").as("first_seen"),
        col("__last_seen").as("last_seen")) ++ payload.map(col)): _*)
  }

  /**
   * Op-coded CDC apply (the Debezium/binlog feed shape): every row is an
   * OPERATION on a key — an upsert carrying a payload, or a delete. Final
   * state is last-op-wins per key in event order: a delete removes the
   * key, a later upsert revives it with a fresh payload — so the state
   * is a pure function of each key's log suffix, independent of how the
   * log was batched into micro-batches or days. ONE shuffle (the per-key
   * window); the delete test runs AFTER the rank, so only each key's
   * final op is ever inspected, and the payload of a deleted key never
   * leaves the exchange. [[merge]] is the delete-blind upsert this
   * generalizes (db_operations.py:334 has no DELETE arm — its feed can
   * only grow); w10 purges a STORE under a tombstone log, this collapses
   * the LOG itself into d2-shaped state.
   */
  def applyCdc(log: DataFrame, key: String, tsCol: String, tiebreak: String,
      opCol: String, deleteOp: String, payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).desc, col(tiebreak).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .select((Seq(col(key)) ++ payload.map(col) :+ col(tsCol).as("op_ts")): _*)
  }

  /**
   * Multi-clause MERGE INTO (first-matching-clause-wins), the
   * warehouse/lakehouse workhorse both [[merge]] (unconditional
   * EXCLUDED-wins upsert) and [[applyCdc]] (op-coded log collapse)
   * specialize: one statement routes every key to DELETE / UPDATE /
   * INSERT / keep by clause order — the dbt-incremental / `MERGE INTO`
   * shape the reference's ON CONFLICT upsert (db_operations.py:334)
   * grows into the moment a feed carries conditional deletes.
   *
   * Clause order (SQL-standard first-match-wins):
   *   1. WHEN MATCHED AND `matchedDeleteWhen`  THEN DELETE
   *   2. WHEN MATCHED                          THEN UPDATE (payload := source)
   *   3. WHEN NOT MATCHED AND `notMatchedInsertWhen` THEN INSERT
   *   4. otherwise the row is untouched: unmatched target rows survive
   *      as-is (`keep`), unmatched source rows failing clause 3 vanish
   *      (`skip`). No NOT-MATCHED-BY-SOURCE arm — absence from a DELTA
   *      feed carries no signal (deletes must be explicit ops).
   *
   * Clause conditions are Columns over the joined row, with source
   * columns exposed as `s_<name>` and target columns as `t_<name>`
   * (the EXCLUDED./target. naming of SQL MERGE).
   *
   * The output carries `merge_action` ('update'/'insert'/'keep') so a
   * gate can pin the ROUTING, not just the final values.
   *
   * SQL MERGE's cardinality rule ("a target row may not be updated
   * twice") is enforced DISTRIBUTIVELY: a per-key count window over the
   * source feeds `assert_true`, so a duplicate-key source fails the job
   * inside the exchange — no driver-side pre-count scan.
   *
   * Cost: ONE shuffle of the (small, delta-sized) source for the
   * cardinality window, plus the key join. At 100 TB the target is the
   * published state bucketed on the key (w3's layout), so the join
   * co-locates and the base never re-shuffles.
   */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
      payload: Seq[String], matchedDeleteWhen: Column,
      notMatchedInsertWhen: Column): DataFrame = {
    val t = target.select(target.columns.map(c => col(c).as(s"t_$c")): _*)
    val srcP = source.select(source.columns.map(c => col(c).as(s"s_$c")): _*)
    val src = srcP
      .withColumn("__dup", count(lit(1)).over(Window.partitionBy(s"s_$key")))
      .filter(coalesce(
        assert_true(col("__dup") <= 1,
          lit(s"MERGE cardinality violation: source holds duplicate rows for a '$key'")),
        lit(true)))
      .drop("__dup")
    val j = t.join(src, col(s"t_$key") === col(s"s_$key"), "full_outer")
    val matched = col(s"t_$key").isNotNull && col(s"s_$key").isNotNull
    val action = when(matched && matchedDeleteWhen, "delete")
      .when(matched, "update")
      .when(col(s"t_$key").isNull && notMatchedInsertWhen, "insert")
      .when(col(s"t_$key").isNull, "skip")
      .otherwise("keep")
    val fromSource = col("merge_action").isin("update", "insert")
    j.withColumn("merge_action", action)
      .filter(col("merge_action").isin("update", "insert", "keep"))
      .select((Seq(
        coalesce(col(s"s_$key"), col(s"t_$key")).as(key),
        col("merge_action")) ++
        payload.map(c =>
          when(fromSource, col(s"s_$c")).otherwise(col(s"t_$c")).as(c))): _*)
  }

  /** EXCLUDED-wins merge of two latestState outputs. */
  def merge(base: DataFrame, delta: DataFrame, key: String,
      payload: Seq[String]): DataFrame = {
    val b = base.select(base.columns.map(c => col(c).as(s"b_$c")): _*)
    val d = delta.select(delta.columns.map(c => col(c).as(s"d_$c")): _*)
    val joined = b.join(d, col(s"b_$key") === col(s"d_$key"), "full_outer")
    val mergedPayload = payload.map(c => coalesce(col(s"d_$c"), col(s"b_$c")).as(c))
    val firstSeen = least(
      coalesce(col("b_first_seen"), col("d_first_seen")),
      coalesce(col("d_first_seen"), col("b_first_seen"))).as("first_seen")
    val lastSeen = greatest(
      coalesce(col("b_last_seen"), col("d_last_seen")),
      coalesce(col("d_last_seen"), col("b_last_seen"))).as("last_seen")
    joined.select((Seq(coalesce(col(s"d_$key"), col(s"b_$key")).as(key),
      firstSeen, lastSeen) ++ mergedPayload): _*)
  }
}
