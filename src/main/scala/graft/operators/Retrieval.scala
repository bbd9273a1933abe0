package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Full-text retrieval over a document corpus: inverted-index build + a
 * BM25-family ranked search — the "find training docs matching a probe
 * query" primitive a curation pipeline runs for targeted corpus audits
 * (and the batch form of any search-backed data-selection loop).
 *
 * No reference counterpart (the reference exposes no search surface);
 * this is the lexical-retrieval leg the LLM-pipeline mandate requires —
 * decontamination lookup, targeted corpus audit, and the BM25 half of
 * hybrid (lexical + dense) search — built index-backed so it survives a
 * corpus you cannot scan per query.
 *
 * Scale shape (the 100-TB story):
 *  - the posting build is ONE shuffle keyed on (term, doc) with map-side
 *    partial counts; document length rides the explode so no second
 *    join against a doc-stats table is ever needed;
 *  - document frequencies reduce the posting table itself (map-side
 *    partials on term — the distinct (term,doc) pairs, never raw tokens);
 *  - the query set is small by definition, so query terms (with their
 *    precomputed idf weights) BROADCAST to the postings — the corpus
 *    side never re-shuffles for scoring;
 *  - per-(query,doc) score aggregation shuffles only MATCHED postings —
 *    cost tracks result size, not corpus size;
 *  - top-k is the two-phase bounded-heap + final-window discipline
 *    (Ann.topK's shape): a single window over query_id would funnel
 *    every scored doc of a query onto one reducer.
 *
 * Determinism (SURVEY §6): no log(). BM25's idf and tf saturation are
 * evaluated as SCALED-INTEGER floors over exact-long operands — both
 * factors are floor(scale·a/b) with a, b exact longs < 2^53, so the
 * IEEE-correctly-rounded double division (and hence the floor) is
 * engine-identical; per-term contributions s1·s2 and their per-doc sums
 * stay exact longs. The production log-idf variant is the same plan with
 * the s1 scalar swapped (log isn't correctly-rounded across libms, so
 * the gated path stays rational — t11's discipline).
 *
 * With k1 = 6/5 and b = 3/4 (the textbook 1.2 / 0.75), multiplying the
 * tf-saturation term through by 20·T (T = total corpus tokens, so
 * avgdl = T/N) clears every fraction:
 *
 *   tfSat = tf·(k1+1) / (tf + k1·(1−b+b·dl·N/T))
 *         = 44·T·tf / (20·T·tf + 6·T + 18·dl·N)          (all longs)
 *   idf   = (N−df+0.5)/(df+0.5) = (2N−2df+1)/(2df+1)     (all longs)
 *
 *   s1 = floor(scale1·(2N−2df+1)/(2df+1))     per query term
 *   s2 = floor(scale2·44·T·tf/(20·T·tf+6·T+18·dl·N))  per matched posting
 *   score(q,d) = Σ_terms s1·s2                exact long
 */
object Retrieval {

  /** Inverted index: one row per (term, doc) with the term frequency and
    * the document's token length. ONE shuffle (map-side partial counts
    * on (term, doc_id, dl) — dl is functionally dependent on doc_id so
    * it rides the key for free instead of costing a later join). */
  def buildPostings(docs: DataFrame, idCol: String, tokensCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        size(col(tokensCol)).cast("long").as("dl"),
        explode(col(tokensCol)).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Per-term document frequency, reduced from the posting table (map-side
    * partials over the already-distinct (term, doc) pairs). */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /**
   * BM25 top-k: rank `postings` docs for each query in `queryTerms`
   * (query_id, term — duplicate terms score twice, as duplicate query
   * tokens do in any BM25). `n` = corpus doc count, `t` = total corpus
   * tokens; both exact. Returns (query_id, doc_id, rank, score), score
   * the exact-long scaled BM25, rank 1-based with (score desc, doc_id
   * asc) ties.
   *
   * Headroom (exactness preconditions, checked against the declared
   * contract): every floor's operands and every score sum must stay
   * < 2^53. `maxTf` (largest in-doc term frequency; enforced in-plan
   * with a raise_error guard, so a corpus that breaks the declaration
   * fails loudly, never silently rounds) and `maxQueryLen` (terms per
   * query; queries are caller-built literals) bound scale2·44·T·maxTf
   * and maxQueryLen·s1max·s2max — size the scales down before a bigger
   * corpus fires the require.
   */
  def bm25TopK(postings: DataFrame, queryTerms: DataFrame, n: Long, t: Long,
      k: Int, scale1: Long = 100000L, scale2: Long = 10000L,
      maxTf: Long = 4096L, maxQueryLen: Long = 16L,
      docFreqTable: Option[DataFrame] = None): DataFrame = {
    require(n > 0 && t > 0, "empty corpus")
    // The guard products themselves must not wrap Long (scale2·44·t
    // overflows for t >= ~2.1e13 tokens — i.e. exactly the 100-TB
    // regime): multiplyExact makes an overflowing GUARD fail loudly
    // instead of spuriously passing on a wrapped value.
    def mul(xs: Long*): Long = xs.reduce((a, b) => Math.multiplyExact(a, b))
    require(mul(scale1, 2 * n + 1) < (1L << 53),
      s"scale1=$scale1 overflows idf headroom at N=$n")
    require(mul(scale2, 44L, t) <= (1L << 53) / maxTf,
      s"scale2 tf-saturation headroom exceeded at T=$t, maxTf=$maxTf")
    val s1max = mul(scale1, 2 * n + 1)
    val s2max = scale2 * 22L / 10L + 1L
    require(mul(maxQueryLen, s1max, s2max) < (1L << 53),
      s"score-sum headroom exceeded: maxQueryLen=$maxQueryLen, N=$n")

    // a maintained index (s13) serves df from its FOLDED summary — the
    // whole point of incremental maintenance is never recounting the
    // posting store at query time; the batch path derives it in-plan.
    val dfT = docFreqTable.getOrElse(docFreq(postings))
    // query-side weights: tiny by construction -> broadcast the whole
    // (query_id, term, s1) table into the posting scan.
    val weighted = queryTerms
      .join(dfT, Seq("term"), "inner") // terms absent from the corpus match no doc: drop
      .withColumn("s1", floor(
        (lit(scale1) * (lit(2 * n) - lit(2) * col("df") + lit(1))).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double")).cast("long"))
      .select("query_id", "term", "s1")

    val tfChecked = when(col("tf") > maxTf,
      raise_error(concat(lit(s"bm25TopK: tf exceeds declared maxTf=$maxTf for term "),
        col("term")))).otherwise(col("tf"))
    val num = (lit(scale2) * lit(44) * lit(t) * tfChecked).cast("double")
    val den = (lit(20) * lit(t) * col("tf") + lit(6) * lit(t) +
      lit(18) * col("dl") * lit(n)).cast("double")
    val scored = postings
      .join(broadcast(weighted), Seq("term"), "inner")
      .withColumn("s2", floor(num / den).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("s1") * col("s2")).as("score"))

    topKByGroup(scored, k)
  }

  private val scoredSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("doc_id", LongType),
    StructField("score", LongType)))

  // ------------------------------------------------------------------
  // Incremental index maintenance (the s13 streaming twin's engine):
  // a search index over an append-only corpus is SEGMENTS + a folded
  // DICTIONARY. Each arriving batch appends its postings as a new
  // segment (never rewriting old ones — a 100-TB posting store is
  // immutable history; compaction is w7's separate job) and folds its
  // per-term df + corpus stats into a NEW summary version computed from
  // (previous summary ⊕ batch aggregate) only — the merge cost tracks
  // dictionary + batch size, never the accumulated posting store.
  // Query time reads the segments plus the LATEST summary; bm25TopK's
  // docFreqTable hook keeps scoring off the recount path.
  // ------------------------------------------------------------------

  private val postingsReadSchema =
    "term STRING, doc_id BIGINT, dl BIGINT, tf BIGINT, batch INT"

  /** Fold one corpus batch into the index store at `root`: postings →
    * segment `batch=<version>`, dictionary/stats → summary `v<version>`
    * merged from version − 1 (version 0 starts the chain). Docs must be
    * new ids (append-only corpus — re-sent ids belong in a d2-style
    * upsert upstream). */
  def indexBatchAppend(root: String, docs: DataFrame, idCol: String,
      tokensCol: String, version: Int): Unit = {
    val spark = docs.sparkSession
    val postings = buildPostings(docs, idCol, tokensCol)
    postings.write.mode("overwrite").parquet(s"$root/postings/batch=$version")
    val batchDf = docFreq(postings)
    val batchStats = docs.select(size(col(tokensCol)).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("dl")).as("t"))
    val (dfOut, statsOut) =
      if (version == 0) (batchDf, batchStats)
      else {
        val prevDf = spark.read.schema("term STRING, df BIGINT")
          .parquet(s"$root/summary/v${version - 1}/df")
        val prevStats = spark.read.schema("n BIGINT, t BIGINT")
          .parquet(s"$root/summary/v${version - 1}/stats")
        (prevDf.unionAll(batchDf).groupBy("term").agg(sum("df").as("df")),
          prevStats.unionAll(batchStats)
            .agg(sum("n").cast("long").as("n"), sum("t").cast("long").as("t")))
      }
    dfOut.write.mode("overwrite").parquet(s"$root/summary/v$version/df")
    statsOut.write.mode("overwrite").parquet(s"$root/summary/v$version/stats")
  }

  /** BM25 search against a maintained index store: all segments + the
    * `version` summary. Explicit read schemas (the w4/w14 discipline —
    * no partition-dir re-inference), df served from the fold. */
  def searchFromStore(spark: org.apache.spark.sql.SparkSession, root: String,
      version: Int, queryTerms: DataFrame, k: Int): DataFrame = {
    val postings = spark.read.schema(postingsReadSchema)
      .parquet(s"$root/postings")
      .select("term", "doc_id", "dl", "tf")
    val dfT = spark.read.schema("term STRING, df BIGINT")
      .parquet(s"$root/summary/v$version/df")
    val st = spark.read.schema("n BIGINT, t BIGINT")
      .parquet(s"$root/summary/v$version/stats").head
    bm25TopK(postings, queryTerms, st.getLong(0), st.getLong(1), k,
      docFreqTable = Some(dfT))
  }

  /** Compact accumulated posting segments into a TERM-RANGE-partitioned
    * store: `repartitionByRange` on term gives pairwise-disjoint per-file
    * term ranges (every occurrence of a term lands in exactly one range
    * partition), and the in-file (term, doc_id) sort makes parquet
    * row-group min/max stats selective for term lookups — the w11
    * skipping discipline applied to a posting store. The range count is
    * SIZED FROM THE DATA (ceil(rows / targetRowsPerFile)): a fixed file
    * count would cap write parallelism and grow per-file size without
    * bound as segments accumulate — the one-file-per-cell hazard w7's
    * compaction fixed, avoided here by construction (file size and task
    * size stay constant at any store size; the count pass is
    * metadata-cheap next to the rewrite). Layout-only: the posting
    * multiset is untouched (the caller's search-parity gate proves
    * it). */
  def compactSegments(spark: org.apache.spark.sql.SparkSession, root: String,
      targetRowsPerFile: Long, through: Int = Int.MaxValue): String = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be positive")
    val segs = spark.read.schema(postingsReadSchema)
      .parquet(s"$root/postings")
      .filter(col("batch") <= through)
      .select("term", "doc_id", "dl", "tf")
    val n = segs.count()
    val numRanges = math.max(2L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val dest = s"$root/compacted"
    segs.repartitionByRange(numRanges, col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(dest)
    dest
  }

  /** Search a PARTIALLY-compacted store: the term-range-compacted file
    * set serves every segment ≤ `compactedThrough`, segments after it
    * are read from their original batch= dirs, and the union feeds the
    * same scaled-integer BM25 through the `version` summary. The gate is
    * structural: the residual scan must carry a `batch` partition filter
    * (pre-compaction segments are PRUNED from the read, never re-scanned
    * — the read-amplification win compaction exists for; THROWS if the
    * filter misses the scan). */
  def searchCompactedStore(spark: org.apache.spark.sql.SparkSession, root: String,
      compactedThrough: Int, version: Int, queryTerms: DataFrame, k: Int): DataFrame = {
    val compacted = spark.read
      .schema("term STRING, doc_id BIGINT, dl BIGINT, tf BIGINT")
      .parquet(s"$root/compacted")
    val residual = spark.read.schema(postingsReadSchema)
      .parquet(s"$root/postings")
      .filter(col("batch") > compactedThrough)
      .select("term", "doc_id", "dl", "tf")
    graft.sources.Sink.assertPartitionPruned(residual, "batch")
    val dfT = spark.read.schema("term STRING, df BIGINT")
      .parquet(s"$root/summary/v$version/df")
    val st = spark.read.schema("n BIGINT, t BIGINT")
      .parquet(s"$root/summary/v$version/stats").head
    bm25TopK(compacted.unionAll(residual), queryTerms,
      st.getLong(0), st.getLong(1), k, docFreqTable = Some(dfT))
  }

  /** THROWS unless every file's [min, max] range of `keyCol` is pairwise
    * disjoint — the precondition for file-level skipping on that key
    * (a lookup may then consult file stats alone). File count is
    * layout-sized (driver-side by construction), never row-sized.
    * STRING keys only: the comparison is lexicographic, which is the
    * range partitioner's order for strings but would silently misjudge
    * numeric ranges ("10" < "9") — guarded, not assumed. */
  def assertDisjointFileRanges(df: DataFrame, keyCol: String): Unit = {
    require(df.schema(keyCol).dataType == StringType,
      s"assertDisjointFileRanges compares lexicographically; '$keyCol' must be STRING")
    val ranges = df.groupBy(input_file_name().as("f"))
      .agg(min(keyCol).cast("string").as("lo"), max(keyCol).cast("string").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        if (lo2 <= hi1) throw new IllegalStateException(
          s"file $keyCol ranges overlap: ...$hi1] vs [$lo2...")
      case _ =>
    }
  }

  /** Two-phase top-k per query_id on (score desc, doc_id asc): a bounded
    * per-partition heap cuts each partition to <= k rows per query, then
    * one window ranks the <= partitions·queries·k survivors. Public —
    * any long-scored (group, id) ranking rides this (BM25, RRF fusion). */
  def topKByGroup(scored: DataFrame, k: Int): DataFrame = {
    require(scored.columns.toSeq == Seq("query_id", "doc_id", "score"),
      s"topKByGroup expects (query_id, doc_id, score), got: ${scored.columns.mkString(", ")}")
    // the mapPartitions below reads r.getLong(i) against a hardcoded
    // all-LongType encoder — a string-keyed caller must fail HERE, not
    // as a ClassCastException inside a running task
    require(scored.schema.fields.forall(_.dataType == LongType),
      s"topKByGroup requires LONG query_id/doc_id/score, got: ${scored.schema.simpleString}")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(scoredSchema)
    // max under this ordering = the WORST kept row (lowest score, then
    // highest doc_id) -> O(log k) eviction at the heap head.
    val worstFirst: Ordering[(Long, Long)] =
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)
    val local = scored.mapPartitions { rows =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long)]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.PriorityQueue.empty[(Long, Long)](worstFirst))
        h.enqueue((r.getLong(2), r.getLong(1)))
        if (h.size > k) h.dequeue()
      }
      heaps.iterator.flatMap { case (q, h) =>
        h.iterator.map { case (s, d) => org.apache.spark.sql.Row(q, d, s) }
      }
    }(enc)
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank"),
        col("score"))
  }
}
