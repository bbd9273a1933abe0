package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media as opaque `binary` payloads + a typed
 * metadata struct, with a per-partition "decode / feature-extract" stage.
 *
 * The Spark-side shape is real and tested — schema, batch iteration via
 * mapPartitions, partition-preserving feature extraction. The codec itself
 * is a STUB (this container has no image/audio libraries): `fakeDecode`
 * derives deterministic pseudo-features (byte length, md5 prefix, a fake
 * width/height) from the payload bytes. Swapping in a real decoder means
 * replacing ONLY `fakeDecode` — the distributed plumbing is unchanged.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
    StructField("feat_mean", DoubleType)))

  /** Wrap documents as a media table: payload = utf-8 bytes of the text. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 512).cast("int").as("meta_width"),
      (col("n_chars") % 256).cast("int").as("meta_height"))

  /** STUB decode: deterministic pseudo-features from payload bytes. */
  private def fakeDecode(docId: Long, kind: String, payload: Array[Byte]): Row = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hex = digest.map("%02x".format(_)).mkString
    // "mean pixel value": mean of the raw bytes — a stand-in for a real
    // decoded-frame statistic; replace with actual codec output.
    val mean = if (payload.isEmpty) 0.0 else payload.map(_ & 0xff).map(_.toLong).sum.toDouble / payload.length
    Row(docId, kind, payload.length.toLong, hex, mean)
  }

  /**
   * Per-partition batch "decode": the exact shape a real extractor needs —
   * iterate a partition's rows, run the (expensive) codec per batch, emit
   * a typed feature row. No shuffle; parallelism = input partitions.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.select("doc_id", "kind", "payload").mapPartitions { rows =>
      rows.map(r => fakeDecode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    }(enc)
  }
}
