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

  /** Bucketed + sorted managed table (bucketBy requires saveAsTable).
    * A join between two tables bucketed on the same key with the same
    * bucket count plans with ZERO shuffle exchanges. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
