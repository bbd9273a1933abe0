package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{text => T, vectors => V}

/**
 * Deduplication family for large-scale training-data pipelines. The exact
 * path generalizes the reference's hash-key dedup (services/normalizer/
 * hash_generator.py); the approximate paths (MinHash+LSH, SimHash,
 * n-gram Jaccard, embedding cosine) are the standard near-dup stack
 * (Broder 1997 resemblance / Charikar 2002 SimHash / Schleimer 2003
 * winnowing).
 *
 * Scale design (SURVEY.md §5): candidate generation is ALWAYS a shuffle on
 * a bucket key — (band, band-hash) for MinHash, the fingerprint itself for
 * SimHash, a label/partition for embeddings — never an O(n²) cross join.
 * Verification (true jaccard / cosine) runs only inside buckets.
 */
object Dedup {

  /** Exact dedup: group on md5 of the content, keep min id as survivor. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dups"))

  /**
   * MinHash + LSH near-duplicate pairs over (id, normalized-text) corpus.
   * Pipeline: word shingles → k min-hashes → `bands` LSH bands → self-join
   * on (band, band-hash) → verify candidates with true shingle Jaccard.
   */
  def minhashPairs(corpus: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    val rowsPerBand = k / bands
    // persisted: the k×|shingles| md5 signature work feeds a self-join (2
    // consumers) and the verification joins (2 more) — without an explicit
    // materialization Spark recomputes the whole hash pipeline per consumer.
    // At cluster scale this is the classic "checkpoint the signatures" step.
    val sh = Par.ensure(corpus).select(
      col(idCol).as("id"),
      T.wordShingles(split(col(textCol), " "), shingleN).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = sh.select(col("id"), col("shingles"),
      T.minhashSignature(col("shingles"), k).as("mh"))
    val bandsDf = sig.select(col("id"),
      posexplode(T.lshBands(col("mh"), bands, rowsPerBand)).as(Seq("b", "bh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.b") === col("b.b") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id1"), col("shingles").as("s1")), "id1")
      .join(sh.select(col("id").as("id2"), col("shingles").as("s2")), "id2")
      .select(col("id1"), col("id2"), T.jaccard(col("s1"), col("s2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * SimHash dedup groups: identical 16-bit fingerprints collapse into one
   * group (hamming-0 clustering — a single shuffle on the fingerprint).
   */
  def simhashGroups(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.ensure(corpus)
      .select(col(idCol).as("id"), T.simhash16(split(col(textCol), " ")).as("simhash"))
      .groupBy("simhash")
      .agg(min(col("id")).as("survivor_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)

  /** Character n-gram Jaccard for candidate pairs (verification primitive). */
  def ngramJaccard(pairs: DataFrame, text1: Column, text2: Column, n: Int): DataFrame =
    pairs.withColumn("jaccard", T.jaccard(T.charNgrams(text1, n), T.charNgrams(text2, n)))

  /**
   * Embedding-cosine near-dup pairs, blocked by `blockCol` (candidates only
   * within a block — at 100 TB the block is a coarse quantization/label so
   * pair count is Σ block², not n²).
   */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double, dim: Int): DataFrame = {
    // Two-phase: (1) cheap codegen'd double-math cosine (unrolled `dim`-term
    // chain) over every in-block pair with a 0.01 safety margin (float
    // accumulation error over 64 dims is ~1e-13, so no true near-dup can be
    // lost); (2) the exact decimal-fold cosine only for the tiny surviving
    // set. Output is identical to scoring every pair exactly, at ~1/100 the
    // compute — the margin does all the pruning.
    val a = emb.select(col(idCol).as("id1"), col(blockCol).as("blk1"),
      col(vecCol).as("v1"), V.normSqUnrolled(col(vecCol), dim).as("nsq1"))
    val b = emb.select(col(idCol).as("id2"), col(blockCol).as("blk2"),
      col(vecCol).as("v2"), V.normSqUnrolled(col(vecCol), dim).as("nsq2"))
    val approx = V.dotUnrolled(col("v1"), col("v2"), dim) /
      sqrt(col("nsq1") * col("nsq2"))
    a.join(b, col("blk1") === col("blk2") && col("id1") < col("id2"))
      .filter(col("nsq1") === 0.0 || col("nsq2") === 0.0 || approx >= threshold - 0.01)
      .select(col("id1"), col("id2"), V.cosine(col("v1"), col("v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
