package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media as opaque `binary` payloads + a typed
 * metadata struct, with a per-partition "decode / feature-extract" stage.
 *
 * The Spark-side shape is real and tested — schema, batch iteration via
 * mapPartitions, partition-preserving feature extraction. The generic
 * feature extractor's codec is a STUB (this container has no external
 * image/audio libraries): `fakeDecode` derives deterministic
 * pseudo-features from the payload bytes, and swapping in a real decoder
 * means replacing ONLY `fakeDecode`. That contract has now met REAL
 * codecs in both directions twice, with the JVM's own: PNG via
 * javax.imageio (synthesizeImages/decodeImages, catalog m6) and PCM WAV
 * via javax.sound.sampled (synthesizeAudio/decodeAudio, catalog m8) —
 * same mapPartitions shape, loud failure on undecodable payloads,
 * statistics the DuckDB oracle replays in closed form.
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

  // one digest instance per executor thread, not per row — this stub is
  // the template a real decoder gets swapped into, so its resource
  // handling has to be the shape users copy (same pattern as
  // graft.plans.TextExpressions' MinhashOps)
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** STUB decode: deterministic pseudo-features from payload bytes. */
  private def fakeDecode(docId: Long, kind: String, payload: Array[Byte]): Row = {
    val md = md5Digest.get()
    md.reset()
    val digest = md.digest(payload)
    val hex = digest.map("%02x".format(_)).mkString
    // "mean pixel value": mean of the raw bytes — a stand-in for a real
    // decoded-frame statistic; replace with actual codec output.
    val mean = if (payload.isEmpty) 0.0 else payload.map(_ & 0xff).map(_.toLong).sum.toDouble / payload.length
    Row(docId, kind, payload.length.toLong, hex, mean)
  }

  /**
   * Frame sampling: every `everyK`-th fixed-size frame of each payload,
   * one output row per sampled frame with its index and content hash —
   * the "don't decode the whole video" step that runs BEFORE feature
   * extraction, so the expensive per-frame codec (the [[extractFeatures]]
   * stage) touches 1/everyK of the bytes.
   *
   * Pure narrow plan: an `explode(sequence(0, nFrames-1, everyK))` per
   * document plus a substring slice — no shuffle, parallelism = input
   * splits, output rows = frames/everyK. With the stub media table the
   * payload is the document TEXT and frames are `frameChars`-character
   * slices (a real implementation slices the binary at codec-defined
   * byte offsets — same plan shape, different slice function).
   */
  def sampleFrames(docs: DataFrame, frameChars: Int, everyK: Int): DataFrame = {
    require(frameChars >= 1 && everyK >= 1, "frameChars and everyK must be positive")
    val nFrames = ceil(length(col("text")).cast("double") / frameChars).cast("bigint")
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), nFrames - 1, lit(everyK.toLong))).as("frame_idx"),
        col("text"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)")).as("frame_md5"),
        length(expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)"))
          .cast("bigint").as("frame_chars"))
  }

  /**
   * Audio FRAME WINDOWING over the stub media table — the sample-rate-
   * aware companion of [[sampleFrames]] (video samples whole frames by
   * index; audio slices OVERLAPPING win/hop windows by time, the
   * framing every MFCC / VAD / ASR-chunking front end runs before any
   * decode). The stub PCM expansion is deterministic — 4 samples per
   * payload byte, sample rate 8/16/24 kHz by doc_id%3 — so window
   * arithmetic is exact integer math both engines replay: frame f
   * covers samples [f·hop, f·hop + win) where win = sr·winMs/1000 and
   * hop = sr·hopMs/1000, and n_frames = (n_samples − win)/hop + 1
   * (zero when the clip is shorter than one window). Every `everyK`-th
   * frame is emitted with its time span and the md5 of its byte slice
   * (samples/4 bytes — the stub payload is the document text, so the
   * slice is a substring; a real codec hashes the decoded window with
   * the SAME plan shape). Pure narrow plan: explode(sequence) +
   * substring, no shuffle, output rows = frames/everyK.
   */
  def audioFrames(docs: DataFrame, winMs: Int, hopMs: Int, everyK: Int): DataFrame = {
    require(winMs >= 1 && hopMs >= 1 && everyK >= 1,
      "winMs, hopMs and everyK must be positive")
    // stub rates are multiples of 8 kHz, so win/hop sample counts and
    // their /4 byte spans stay exact integers for the default 25/10 ms
    val sr = (col("doc_id") % 3 + 1) * 8000L
    val winS = sr * winMs / 1000L
    val hopS = sr * hopMs / 1000L
    val nSamples = length(col("text")).cast("bigint") * 4L
    val nFrames = when(nSamples < winS, 0L)
      .otherwise((nSamples - winS) / hopS + 1L)
    docs.filter(col("doc_id") % 3 === 1 && length(col("text")) > 0)
      .select(col("doc_id"), col("text"), sr.as("sr"),
        winS.as("win_s"), hopS.as("hop_s"), nFrames.cast("int").as("nf"))
      .filter(col("nf") > 0) // sub-window clips: no frames (sequence needs lo <= hi)
      .select(col("doc_id"), col("sr"), col("win_s"), col("hop_s"),
        explode(sequence(lit(0), col("nf") - 1, lit(everyK))).as("frame_idx"),
        col("text"))
      .select(
        col("doc_id"),
        col("sr").as("sample_rate"),
        col("frame_idx").cast("bigint").as("frame_idx"),
        (col("frame_idx") * hopMs).cast("bigint").as("start_ms"),
        (col("frame_idx") * hopMs + winMs).cast("bigint").as("end_ms"),
        md5(expr("substring(text, CAST(frame_idx * hop_s / 4 + 1 AS INT), CAST(win_s / 4 AS INT))"))
          .as("frame_md5"))
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

  // ------------------------------------------------------------------
  // REAL codec boundary (javax.imageio — ships in the JVM, no new
  // dependency): deterministic RGB test-card images are ENCODED to real
  // PNG payloads and DECODED back through ImageIO inside the same
  // mapPartitions contract the stub uses, so the m-family's decode seam
  // has now met an actual codec in both directions. PNG is lossless
  // 8-bit RGB, so every decoded pixel equals the synthesized function
  // exactly and the oracle can replay dimensions and channel sums as
  // closed-form integer arithmetic.

  val imagePayloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val imageStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** The test card's dimensions and per-channel pixel functions — pure
    * integer functions of (doc_id, x, y) so an engine WITHOUT a codec
    * can replay the decoded statistics:
    * w = id%24+8, h = id%16+8, r = (x+id)%256, g = (3y+7id)%256,
    * b = (2x+5id)%256. */
  def testCardDims(id: Long): (Int, Int) = ((id % 24 + 8).toInt, (id % 16 + 8).toInt)

  /** Encode one deterministic RGB test card per input row as a REAL PNG
    * (ImageIO encode — the payload is a decodable image any external
    * tool opens, not a stub byte string). Narrow map-only plan: no
    * shuffle, parallelism = input splits; readers/writers are created
    * per call (ImageIO statics are thread-safe that way). */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imagePayloadSchema)
    docs.select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = testCardDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rr = ((x + id) % 256).toInt
            val gg = ((3L * y + 7L * id) % 256).toInt
            val bb = ((2L * x + 5L * id) % 256).toInt
            img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        val ok = javax.imageio.ImageIO.write(img, "png", out)
        if (!ok) throw new IllegalStateException("JVM has no PNG encoder")
        Row(id, out.toByteArray)
      }
    }(enc)
  }

  /** DECODE real image payloads (ImageIO.read) and reduce each to its
    * pixel statistics — dimensions, exact per-channel sums, means. The
    * per-row contract m2's stub stands in for, now against a real
    * codec. Narrow map-only plan; a payload that is not a decodable
    * image FAILS the row loudly (a silent null would let corrupt media
    * flow downstream as zeros). */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imageStatsSchema)
    media.select("doc_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null)
          throw new IllegalStateException(s"doc $id payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Row(id, w, h, n, sr, sg, sb,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // REAL audio codec boundary (javax.sound.sampled — ships in the JVM,
  // no new dependency; file-format parsing only, no audio device): the
  // WAV twin of the PNG pair above, closing the m-family's last stub
  // seam (m5's PCM expansion). Deterministic 16-bit mono PCM test tones
  // are ENCODED to real RIFF/WAVE payloads and DECODED back through
  // AudioSystem inside the same mapPartitions contract, reduced to
  // exact sample statistics. PCM WAV is lossless, so every decoded
  // sample equals the synthesis function exactly and the oracle can
  // replay the statistics in closed-form integer arithmetic.

  val audioPayloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_s", LongType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType),
    StructField("min_s", IntegerType),
    StructField("max_s", IntegerType),
    StructField("mean_s", DoubleType)))

  /** The test tone's parameters and per-sample function — pure integer
    * functions of (doc_id, i) so an engine WITHOUT a codec can replay
    * the decoded statistics: sr = (id%4+1)·8000 Hz, n = id%480+32,
    * s_i = (31·id + 17·i + i²%97) % 65536 − 32768. */
  def testToneParams(id: Long): (Int, Int) =
    (((id % 4 + 1) * 8000).toInt, (id % 480 + 32).toInt)

  def testToneSample(id: Long, i: Int): Int =
    ((31L * id + 17L * i + (i.toLong * i) % 97) % 65536L - 32768L).toInt

  /** Encode one deterministic PCM test tone per input row as a REAL WAV
    * file (AudioSystem.write — the payload is a playable RIFF/WAVE any
    * external tool opens, not a stub byte string). Narrow map-only
    * plan: no shuffle, parallelism = input splits. */
  def synthesizeAudio(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioPayloadSchema)
    docs.select("doc_id").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (sr, n) = testToneParams(id)
        val pcm = new Array[Byte](n * 2) // 16-bit little-endian mono
        var i = 0
        while (i < n) {
          val s = testToneSample(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sr.toFloat, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Row(id, out.toByteArray)
      }
    }(enc)
  }

  /** DECODE real WAV payloads (AudioSystem.getAudioInputStream) and
    * reduce each to its exact sample statistics — rate, count, sum,
    * sum of |s|, sum of s² (all exact in Long at the fixture's ≤511
    * samples; at 100 TB a real pipeline would carry the same moments
    * as per-clip partial aggregates), min/max, mean. A payload that is
    * not a parseable 16-bit mono PCM WAV FAILS the row loudly. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioStatsSchema)
    media.select("doc_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          throw new IllegalStateException(
            s"doc $id payload is not 16-bit mono PCM LE WAV: $fmt")
        val bytes = ais.readAllBytes()
        if (bytes.length % 2 != 0)
          throw new IllegalStateException(s"doc $id has a torn 16-bit frame")
        val n = bytes.length / 2
        var (sum, sabs, ssq) = (0L, 0L, 0L)
        var (mn, mx) = (Int.MaxValue, Int.MinValue)
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          sum += s; sabs += math.abs(s); ssq += s.toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        Row(id, fmt.getSampleRate.toInt, n.toLong, sum, sabs, ssq, mn, mx,
          sum.toDouble / n)
      }
    }(enc)
  }
}
