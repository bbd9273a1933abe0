package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/**
 * Mart builders, re-expressing the reference's dbt models:
 *
 *  - [[incrementalFact]]: dbt/job_dbt/models/marts/fact_jobs.sql —
 *    incremental watermark filter on the fact source + surrogate key +
 *    broadcast left join onto the dimension.
 *  - [[scd1Dim]]: dbt/job_dbt/models/marts/dim_companies.sql — SCD Type-1,
 *    latest observation per key wins.
 *
 * Scale notes (SURVEY.md §5): the watermark predicate is a plain pushed
 * filter (partition-pruning on date at real scale); the dim side is
 * broadcast so the fact never shuffles for the join; SCD1 is one shuffle
 * on the dim key.
 */
object Marts {

  /**
   * Incremental fact build: rows of `fact` with `tsCol` past the watermark,
   * left-joined (broadcast) to `dim` on the key, plus an md5 surrogate uid
   * over the dim's natural name (fact_jobs.sql company_id_normalized).
   */
  def incrementalFact(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, dimName: String, tsCol: String, watermark: String): DataFrame = {
    fact.filter(col(tsCol) > lit(watermark))
      .join(broadcast(dim), col(factKey) === col(dimKey), "left")
      .withColumn("dim_uid",
        md5(T.normKey(coalesce(col(dimName), lit("unknown")))))
  }

  /** SCD Type-1: one row per key, latest by (tsCol desc, tiebreak desc). */
  def scd1Dim(observations: DataFrame, key: String, tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).desc, col(tiebreak).desc)
    observations.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * SCD Type-2: full validity-interval history per key — the standard
   * next capability past [[scd1Dim]]'s latest-wins (the reference mart
   * is SCD1; any consumer asking "what was the dim value WHEN this fact
   * happened" needs the Type-2 form, which then joins facts as-of —
   * Temporal.asofJoin's build side).
   *
   * From raw observations (key, tsCol, tiebreak, payload...):
   *  1. per (key, ts) keep the final observation (highest tiebreak) —
   *     an in-window `lead(ts) != ts` test, no extra exchange;
   *  2. CHANGE COMPRESSION: drop observations whose payload equals the
   *     previous one (SCD2 records transitions, not touches);
   *  3. [valid_from, valid_to): valid_to = next change's ts, open
   *     intervals closed with `openEnd` (the 9999-12-31 convention —
   *     also what keeps the output NULL-free for hash gates), plus an
   *     is_current flag.
   *
   * ONE exchange end-to-end: every window partitions by `key` and
   * orders by (ts asc, tiebreak asc), so steps 2 and 3 reuse step 1's
   * shuffle AND sort — the plan has one Exchange + one Sort feeding
   * three Window operators (asserted in OperatorsSpec). At 100 TB the
   * history table this produces is written bucketed by key
   * (graft.sources.Sink.writeBucketed) so fact joins stay co-located.
   */
  def scd2Dim(observations: DataFrame, key: String, tsCol: String,
      tiebreak: String, payload: Seq[String], openEnd: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).asc, col(tiebreak).asc)
    val lastPerTs = observations
      .withColumn("__nxt_ts", lead(col(tsCol), 1).over(w))
      .filter(col("__nxt_ts").isNull || col("__nxt_ts") =!= col(tsCol))
    val changedOnly = payload.foldLeft(lastPerTs) { case (df, c) =>
        df.withColumn(s"__prev_$c", lag(col(c), 1).over(w))
      }
      .withColumn("__is_first", lag(col(tsCol), 1).over(w).isNull)
      .filter(col("__is_first") ||
        payload.map(c => !(col(s"__prev_$c") <=> col(c))).reduce(_ || _))
    val openLit = lit(openEnd).cast(observations.schema(tsCol).dataType)
    changedOnly
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", coalesce(lead(col(tsCol), 1).over(w), openLit))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
      .select((Seq(col(key), col("valid_from"), col("valid_to"),
        col("is_current")) ++ payload.map(col)): _*)
  }

  // ----------------------------------------------------------- bitemporal
  // BITEMPORAL dimension maintenance: [[scd2Dim]] answers "what was
  // true WHEN the fact happened" (valid time); a bitemporal table also
  // answers "what did the WAREHOUSE believe at load T" (transaction
  // time) — the axis that makes every historical report reproducible
  // after late-arriving corrections rewrite validity intervals. Rows
  // are never deleted: a load that supersedes an interval CLOSES it
  // (tx_to = the load id) and writes the replacement with tx_from =
  // the load id, so filtering tx_from <= T < tx_to replays exactly the
  // SCD2 snapshot load T produced.

  /** First load: every snapshot row opens at `txId`. */
  def bitemporalInit(snapshot: DataFrame, txId: Long): DataFrame =
    snapshot
      .withColumn("tx_from", lit(txId))
      .withColumn("tx_to", lit(null).cast("long"))

  /**
   * Incremental load fold: diff the new SCD2 `snapshot` (built from ALL
   * observations known at load `txId` — late rows included, which is
   * why intervals can split/move) against the table's OPEN tx slice on
   * the full row identity `cols`:
   *  - rows in both carry forward untouched (tx_from keeps its origin);
   *  - open rows absent from the snapshot are CLOSED (tx_to = txId);
   *  - snapshot rows absent from the open slice enter (tx_from = txId).
   * Already-closed history rides along unread. ONE full-outer null-safe
   * join on the identity columns classifies every row — both sides
   * present = carried, open-only = closed, snapshot-only = fresh — so
   * the diff is structurally one shuffle per side (the earlier
   * three-equi-join shape computed the same three legs but its
   * "one shuffle per side" cost depended on ReuseExchange deduplicating
   * the repeated subtrees); at 100 TB the diff touches the DIM, never
   * the facts. Identity duplicates are out of contract: `cols` IS the
   * full row identity, so a dim holding two byte-identical rows is
   * upstream corruption this diff does not define an order for.
   */
  def bitemporalApply(prev: DataFrame, snapshot: DataFrame, txId: Long,
      cols: Seq[String]): DataFrame = {
    val open = prev.filter(col("tx_to").isNull).withColumn("__open", lit(1))
    val snap = snapshot.select(cols.map(col): _*).withColumn("__snap", lit(1))
    val joined = open.join(snap,
      cols.map(c => open(c) <=> snap(c)).reduce(_ && _), "full_outer")
    val diffed = joined.select(
      cols.map(c => coalesce(open(c), snap(c)).as(c)) ++ Seq(
        // carried/closed keep their origin tx_from; fresh opens at txId
        when(col("__open").isNotNull, col("tx_from"))
          .otherwise(lit(txId)).as("tx_from"),
        // open rows the snapshot no longer contains close at txId;
        // carried and fresh stay open (null)
        when(col("__open").isNotNull && col("__snap").isNull, lit(txId))
          .cast("long").as("tx_to")): _*)
    prev.filter(col("tx_to").isNotNull).unionByName(diffed)
  }

  /** The tx-time-travel read: the SCD2 snapshot as load `txId` saw it. */
  def bitemporalAsOfTx(bt: DataFrame, txId: Long): DataFrame =
    bt.filter(col("tx_from") <= txId &&
      (col("tx_to").isNull || col("tx_to") > txId))
}
