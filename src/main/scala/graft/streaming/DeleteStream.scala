package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming DELETES against a published keyed store — the lifecycle's
 * last batch-only seam closed (ingest s6, publish s5/s9, CDC s8, and
 * now right-to-erasure): a stream of tombstone keys folds into the
 * store as POSITIONAL deletion vectors (w19's sidecar), so each
 * trigger costs O(the trigger's deleted rows) — no data file is ever
 * rewritten on the hot path, and every reader's merge-on-read overlay
 * sees each trigger's deletes the moment its sidecar lands. The
 * deferred fold (Sink.foldDeletionVectors) stays a scheduled batch
 * concern, exactly like w7's compaction for s6's appends.
 *
 * The foreachBatch body is a named function shared by the real stream,
 * the s10 catalog twin (trigger slices folded through the SAME body
 * under the oracle + byte-identical-store gates), and StreamingSpec
 * (MemoryStream, per-trigger overlay parity) — the s5 discipline.
 *
 * Effectively-once: each trigger writes its DV rows under a
 * DETERMINISTIC `batch=<id>` subdir with overwrite, so a foreachBatch
 * RETRY rewrites the identical rows instead of double-appending (the
 * s7 versioned-overwrite discipline; and even a duplicated DV row
 * would be absorbed by the overlay's anti-join semantics).
 */
object DeleteStream {

  /** The foreachBatch body: the trigger's tombstones — (`keyCol`,
    * `partitionCol`) rows, bucket derived from the key by the caller's
    * contract (w10's derivability) — become positional DV rows via a
    * partition-pruned scan (throws otherwise, inside Sink) appended
    * under `dvRoot/batch=<id>`. An empty trigger writes nothing. */
  def dvDeleteBatch(schema: String, storePath: String, dvRoot: String,
      partitionCol: String, keyCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty)
      graft.sources.Sink.buildDeletionVectors(
        batch.sparkSession, schema, storePath, partitionCol, keyCol, batch)
        .write.mode("overwrite").parquet(s"$dvRoot/batch=$batchId")

  /** Start the delete stream: `stream` must carry (`keyCol`,
    * `partitionCol`) tombstone rows. */
  def deleteStream(stream: DataFrame, schema: String, storePath: String,
      dvRoot: String, partitionCol: String, keyCol: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch(dvDeleteBatch(schema, storePath, dvRoot, partitionCol, keyCol) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
