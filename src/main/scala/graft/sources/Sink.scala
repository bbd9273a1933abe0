package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Write/publish path (reference: services/publisher_hyper/exporter.py —
 * the mart-export step), re-expressed as the two layout decisions that
 * matter at 100 TB:
 *
 *  - [[writePartitioned]]: hive-style directory partitioning. Downstream
 *    incremental consumers (the daily fact build, an ANN probe) then get
 *    PARTITION PRUNING at the file-listing level — a date- or
 *    LSH-bucket-partitioned corpus turns "scan 100 TB" into "scan one
 *    partition".
 *  - [[writeBucketed]]: hash-bucketed + sorted table on a join/merge key.
 *    Repeated daily upserts (Upsert.merge on hash_key) and fact-dim joins
 *    against a table bucketed on the same key skip the big side's shuffle
 *    entirely — the single largest recurring cost of a daily 100-TB merge
 *    (SURVEY.md §5 "write-side bucketing").
 */
object Sink {

  /** Partitioned parquet write; `partitionCols` become directory keys that
    * Spark prunes on read when a filter touches them. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Publish/consume roundtrip: write `df` hive-partitioned at `path`,
    * read it back, and return the frame filtered to ONE partition value —
    * the shape every downstream incremental consumer runs. The filter
    * lands in the scan's PartitionFilters (directory-level pruning, no
    * data files of other partitions touched — asserted in SinkSpec). */
  def publishRoundtrip(spark: SparkSession, df: DataFrame, path: String,
      partitionCol: String, value: String): DataFrame = {
    writePartitioned(df, path, Seq(partitionCol))
    spark.read.parquet(path).filter(col(partitionCol) === value)
  }

  /**
   * SIZE-BUDGETED compaction of a hive-partitioned store: rewrite `df`
   * under `destPath` so every partition value holds at most
   * ceil(partitionRows / targetRowsPerFile) files. Each partition's rows
   * are dealt to that many deterministic salt groups (xxhash64 of
   * `saltCol` mod the partition's own group count — derived from a
   * per-partition count that joins back broadcast, one row per
   * partition value) and the shuffle distributes on (partition, group).
   *
   * The salt is the load-bearing half: compacting with a bare
   * `repartition(partitionCol)` sends a HOT partition's entire row set
   * to ONE task and ONE monolithic file — recreating, at the hot end,
   * the straggler/giant-file problem compaction exists to solve. A real
   * compactor targets a FILE-SIZE budget, not a file-count of one;
   * here a popular partition compacts to several bounded files written
   * by several tasks, and the cold tail still collapses to one file
   * each. Group→task collisions can only MERGE groups of one partition
   * (fewer, larger files — never more than the target).
   *
   * Returns the per-partition-value file budget (`partitionCol`,
   * `_rows`, `_max_files`) for the caller's gate: "every partition ≤ its
   * budget AND strictly fewer total files than before" is checkable
   * in-engine via input_file_name with no driver listing.
   */
  def compactPartitioned(df: DataFrame, destPath: String, partitionCol: String,
      saltCol: String, targetRowsPerFile: Long): DataFrame = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be positive")
    import org.apache.spark.sql.functions.{broadcast, ceil, count, lit, pmod, sum, xxhash64}
    val budgets = df.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("_rows"))
      .withColumn("_max_files",
        ceil(col("_rows").cast("double") / targetRowsPerFile).cast("int"))
      .cache()
    // the write width IS the total file budget: an explicit task count
    // (REPARTITION_BY_NUM) pins it — a column-only repartition is
    // adaptive, and AQE happily coalesces a small shuffle into one task,
    // silently restoring the one-monolithic-file-per-hot-partition shape
    // this function exists to prevent
    val nTasks = budgets.agg(sum(col("_max_files"))).first().getLong(0)
    require(nTasks <= Int.MaxValue, s"file budget $nTasks exceeds task limit")
    val salted = df
      .join(broadcast(budgets.select(col(partitionCol), col("_max_files"))),
        Seq(partitionCol))
      .withColumn("_grp", pmod(xxhash64(col(saltCol)), col("_max_files").cast("bigint")))
    salted.repartition(nTasks.toInt, col(partitionCol), col("_grp"))
      .drop("_grp", "_max_files")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(destPath)
    budgets
  }

  /** Bucketed + sorted managed table (bucketBy requires saveAsTable).
    * A join between two tables bucketed on the same key with the same
    * bucket count plans with ZERO shuffle exchanges. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /**
   * One incremental state-publish step — the per-trigger/per-day body of
   * the CONTINUOUS daily merge (s2's stateful upsert composed with w3's
   * bucketed layout): fold a latest-state `delta` into the previous
   * bucketed state version and publish the result as the NEXT version
   * table (write-new-then-swap-pointer — a reader never sees a
   * half-written state, and the previous version stays queryable until
   * the pointer moves; the catalog-table version chain here is the
   * engine analog of the reference's transactional staging upsert).
   *
   * Scale invariant, ENFORCED at every step: the (bucketed) base is the
   * 100-TB side and must never re-shuffle — the step THROWS if any
   * bucketed scan sits below a shuffle exchange in the executed merge
   * plan. Only the trigger-sized delta may exchange (its latest-state
   * window shuffle doubles as the merge join's distribution — Spark
   * reuses the partitioning, so a step plans exactly one exchange).
   *
   * Returns the published version table, the next step's base.
   */
  def mergeStateVersion(spark: SparkSession, delta: DataFrame,
      prevTable: Option[String], nextTable: String, keyCol: String,
      payload: Seq[String], nBuckets: Int, path: String): DataFrame = {
    val merged = prevTable match {
      case None => delta
      case Some(prev) =>
        // the DELTA adopts the state's bucket layout before the merge:
        // without this, a session shuffle width different from nBuckets
        // makes EnsureRequirements align the join by re-shuffling the
        // BASE to the session width (the exact inversion this function
        // forbids — the guard below caught it at width 32 vs 8 buckets).
        // Repartitioning the trigger-sized delta is the cheap direction,
        // and is what a production merge does anyway: deltas conform to
        // the state table's layout, never the reverse.
        graft.operators.Upsert.merge(
          spark.table(prev).hint("merge"),
          delta.repartition(nBuckets, col(keyCol)).hint("merge"), keyCol, payload)
    }
    assertNoBucketedScanBelowShuffle(merged)
    spark.sql(s"DROP TABLE IF EXISTS $nextTable")
    merged.write.format("parquet").bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .option("path", path).mode("overwrite").saveAsTable(nextTable)
    spark.table(nextTable)
  }

  /** THROW if any bucketed table scan sits below a shuffle exchange in
    * `df`'s physical plan — the [[mergeStateVersion]] invariant, also
    * unit-tested directly. Under AQE (the default) the executed plan is
    * an AdaptiveSparkPlanExec LEAF, which `collect` will not descend
    * into — inspect its `initialPlan` instead (the plan AFTER
    * EnsureRequirements inserted the exchanges but BEFORE any adaptive
    * re-optimization; `inputPlan` would be too early — it carries no
    * exchanges at all. AQE may later reuse or coalesce exchanges, but
    * never INSERTS a shuffle that was not in the initial plan, so "no
    * exchange above the bucketed scan" proven here holds for every
    * adaptively executed variant). */
  private[graft] def assertNoBucketedScanBelowShuffle(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val bucketedScanShuffled = plan
      .collect { case e: ShuffleExchangeLike => e }
      .exists(_.collectFirst {
        case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
      }.isDefined)
    if (bucketedScanShuffled)
      throw new IllegalStateException(
        s"state merge must never re-shuffle the bucketed base:\n$plan")
  }
}
