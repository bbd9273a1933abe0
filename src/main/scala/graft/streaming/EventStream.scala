package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured Streaming twin of the reference's incremental daily batch
 * (reference: airflow/dags/jobs_etl_daily.py orchestrates extract →
 * normalize → enrich on a schedule; the streaming version is the same
 * dataflow with a watermark instead of a cron watermark column).
 *
 * The SAME plan builders run in batch (Catalog s1_stream_window, which the
 * DuckDB oracle checks) and in streaming (StreamingSpec drives them through
 * readStream + memory sink): Spark's unified Dataset API guarantees the
 * semantics line up, which is exactly why the engine is Spark-first.
 */
object EventStream {

  /**
   * Watermarked tumbling-window aggregation. On a streaming input this
   * emits append-mode finalized windows 30 min after event time passes;
   * on a batch input the watermark node is a no-op and it is a plain
   * window aggregation.
   */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .filter(col("event_type").isin("click", "view"))
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /**
   * Streaming dedup by key within the watermark horizon — the streaming
   * form of the staging-table hash-key upsert (db_operations.py:334): the
   * first event per (user_id, event_type, hour) wins, late duplicates are
   * dropped while their state is still within the watermark.
   */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .withColumn("hour_bucket", date_trunc("hour", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour_bucket")
}
