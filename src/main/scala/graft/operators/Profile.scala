package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/**
 * Dataset profiling: the discovery step a pipeline runs before writing
 * dbt-style contracts (the reference hand-maintains its expectations in
 * dbt/job_dbt/models/marts/schema.yml; a 100-TB corpus needs them
 * MEASURED first) and the vocabulary build a tokenizer-training run
 * starts from.
 */
object Profile {

  /**
   * One-pass per-column profile: row count, non-null count, exact
   * distinct count, and numeric min/max (null for non-numeric columns) —
   * one output row per profiled column.
   *
   * Plan shape: a single global aggregate. The n exact `count(distinct)`s
   * plan as ONE Expand (×(n+1) row amplification) feeding a partial
   * aggregate, so the exchange carries per-partition partials only —
   * there is no per-column scan and no driver loop. Exact distinct at
   * 100 TB is a real (Expand + wide hash table) cost; when a contract
   * only needs cardinality ESTIMATES, swap `approx_count_distinct`
   * in (HLL sketch, no Expand) — kept exact here because the catalog
   * gate hash-compares against DuckDB.
   */
  def columnProfile(df: DataFrame, colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty, "profile at least one column")
    // resolve against the schema with the SESSION'S resolver (case-
    // insensitive by default, matching Spark column resolution): a
    // differently-cased numeric column must profile as numeric, not
    // silently fall to the null min/max branch, and duplicates after
    // resolution would alias-collide in the aggregate
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val cols = colNames.map { c =>
      val matches = df.schema.fields.filter(f => resolver(f.name, c))
      require(matches.length == 1,
        s"column '$c' resolves to ${matches.length} schema fields " +
          s"(${df.schema.fieldNames.mkString(", ")})")
      matches.head.name
    }
    require(cols.distinct.length == cols.length,
      s"profiled columns must be distinct after resolution, got ${cols.mkString(", ")}")
    val numeric = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    def minMax(c: String, f: String => org.apache.spark.sql.Column) =
      if (numeric(c)) f(c).cast("double") else lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        minMax(c, x => min(col(x))).as(s"__mn_$c"),
        minMax(c, x => max(col(x))).as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"),
        col(s"__mx_$c").as("max_num"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /**
   * Overlapping token-window chunking — the retrieval/RAG prep step
   * (documents cut into up-to-`chunkTokens`-token windows every
   * `stride` tokens, so consecutive chunks overlap by
   * `chunkTokens - stride`). One output row per window whose start lies
   * within the document; trailing windows may be short.
   *
   * Pure narrow plan: the split token array is projected once per
   * document, windows come from an `explode(sequence(...))` + `slice` —
   * zero shuffle, the same build discipline as the shingle/boilerplate
   * operators (never a window-`lead` over an exploded token table).
   */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1, "chunkTokens and stride must be positive")
    // split("") is [""], not [] — filter on the normalized TEXT, or a
    // whitespace-only doc would emit one empty window
    val ws = docs
      .filter(graft.functions.text.normKey(col(textCol)) =!= "")
      .select(col(idCol), graft.functions.text.words(col(textCol)).as("ws"))
    // windows start at 0, stride, 2*stride, ... while start < n_tokens
    val nWin = ((size(col("ws")) + stride - 1) / stride).cast("bigint")
    ws.select(col(idCol),
        explode(sequence(lit(0L), nWin - 1)).as("chunk_idx"),
        col("ws"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("ws"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ").as("chunk_text"),
        least(size(col("ws")) - col("chunk_idx") * stride, lit(chunkTokens))
          .cast("bigint").as("n_tokens"))
  }

  /**
   * Corpus vocabulary: whitespace tokens of the normalized text, ranked
   * by total term frequency (ties broken by token), with exact document
   * frequency — the counting pass a BPE/WordPiece trainer, a stopword
   * list, or an IDF table is built from.
   *
   * Plan shape: narrow tokenize/explode (no pre-shuffle), then the
   * (token, doc) distinct + count aggregates partial-aggregate map-side —
   * the exchange carries per-split partial counts, not the token stream.
   * The global top-n is a TakeOrderedAndProject (per-partition heaps →
   * driver merge of n·partitions rows), never a full sort.
   */
  def vocabTopK(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = docs.select(
        col(idCol).as("id"),
        explode(graft.functions.text.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    toks.groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(n)
  }

  /**
   * Intra-document repetition signals — the Gopher-class repetition
   * filters (Rae et al. 2021 §A1.1.2: "repetitious documents are
   * low-quality"; every major pipeline thresholds on these): per doc,
   * the duplicate-word fraction, duplicate 2-/3-gram fractions
   * (1 − distinct/total occurrences), and the top-2-gram fraction (share
   * of the single most frequent 2-gram). Complements the CROSS-document
   * family (l1/l2/t6 see text repeated across docs; these see a doc
   * repeating ITSELF — a loop-generated page, a keyword-stuffed listing).
   *
   * Pure narrow plan, zero shuffle: the token array is projected once,
   * grams come from transform/slice over it, and the per-doc mode
   * (top-gram count) is an O(distinct·total) array fold per row — for
   * documents (≤ thousands of words) that beats any explode + groupBy
   * per (doc, gram), which would shuffle the whole gram stream to
   * compute a per-row statistic. Int/int double divisions are
   * IEEE-identical cross-engine, so the gate hash-matches.
   */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val empty = typedLit(Seq.empty[String])
    val wsCol = when(graft.functions.text.normKey(col(textCol)) === "", empty)
      .otherwise(graft.functions.text.words(col(textCol)))
    def grams(n: Int): Column =
      when(size(col("ws")) >= n,
        transform(sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " ")))
        .otherwise(empty)
    def dupFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0))
        .otherwise((size(g) - size(array_distinct(g))).cast("double")
          / size(g).cast("double"))
    def topFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0))
        .otherwise(array_max(transform(array_distinct(g),
          d => size(filter(g, x => x === d)))).cast("double")
          / size(g).cast("double"))
    docs.select(col(idCol), wsCol.as("ws"))
      .select(col(idCol), col("ws"), grams(2).as("g2"), grams(3).as("g3"))
      .select(col(idCol),
        size(col("ws")).cast("bigint").as("n_words"),
        dupFrac(col("ws")).as("dup_word_frac"),
        dupFrac(col("g2")).as("dup_2gram_frac"),
        dupFrac(col("g3")).as("dup_3gram_frac"),
        topFrac(col("g2")).as("top_2gram_frac"))
  }

  /**
   * Laplace-smoothed bigram language model trained on a reference slice
   * — the model half of the CCNet/KenLM-style LM quality filter
   * ([[lmScore]]): bigram counts, bigram-LHS unigram counts (so
   * Σ_w2 c2(w1,w2) = c1(w1) — a proper conditional), and the training
   * vocabulary size, collected to driver maps. The maps are the
   * broadcast dictionary of the scoring pass (the e1 skills-dictionary
   * discipline): their size is a SERVING-BUDGET knob, not a data-sized
   * artifact — `maxEntries` caps each map by (count desc, key) with
   * deterministic ties, which is how a web-scale model stays
   * broadcastable (rare tails fold into the smoothing mass exactly as
   * an unseen pair would). Training itself is two count aggregates +
   * one distinct over the reference slice — map-side partials, one
   * shuffle each, and the reference slice is by definition the small,
   * curated fraction of the corpus.
   */
  def bigramModel(train: DataFrame, tokens: Column, maxEntries: Int)
      : (Map[String, Long], Map[String, Long], Long) = {
    val pairs = train.select(tokens.as("t")).filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(maxEntries)
      .collect().map(r => s"${r.getString(0)} ${r.getString(1)}" -> r.getLong(2))
      .toMap
    val uni = pairs.groupBy("w1").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1")).limit(maxEntries)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = train.select(tokens.as("t"))
      .select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w"))).head.getLong(0)
    (bi, uni, vocab)
  }

  /**
   * LM quality scoring (the filter CCNet runs with a KenLM model): each
   * document's mean Laplace bigram probability under a [[bigramModel]],
   * plus its out-of-model bigram count. FULLY NARROW — the model rides
   * along as two map literals (a broadcast dictionary, not a join
   * side), and the whole score is one fold over the token array per
   * row, so a 100-TB scoring pass is map-only: zero shuffle, zero
   * model re-read per partition.
   *
   * Engine-exact by construction (SURVEY §6): each pair's probability
   * is the SCALED-INTEGER floor((c2+1)·scale / (c1+V)) — numerator and
   * denominator are exact longs far below 2^53, the double division is
   * IEEE-correctly-rounded, and the quotient sits ≥ 1/denominator away
   * from the integer below it, so `floor` lands identically in any
   * engine; sums of the scaled longs are exact. (The production
   * variant scores in log space — same plan, swap the per-pair scalar
   * for a log; kept linear here because log/exp are NOT
   * correctly-rounded across libms and the catalog gate hash-compares
   * doubles.) Scale headroom: (c2+1)·scale must stay < 2^53 — at
   * scale=1e9 that holds until a single bigram repeats ~9·10^6 times
   * in the reference slice; size `scale` down before it fires.
   */
  def lmScore(docs: DataFrame, tokens: Column, bi: Map[String, Long],
      uni: Map[String, Long], vocab: Long, scale: Long): DataFrame = {
    require(bi.isEmpty || (bi.values.max + 1) * scale < (1L << 53),
      s"scale=$scale overflows double-exact range for max bigram count ${bi.values.max}")
    val biCol = typedLit(bi)
    val uniCol = typedLit(uni)
    val t = tokens
    def w1(i: Column) = element_at(t, i + 1)
    def w2(i: Column) = element_at(t, i + 2)
    def key(i: Column) = concat(w1(i), lit(" "), w2(i))
    def ps(i: Column) = floor(
      ((coalesce(element_at(biCol, key(i)), lit(0L)) + lit(1L)) * lit(scale))
        .cast("double") /
        (coalesce(element_at(uniCol, w1(i)), lit(0L)) + lit(vocab)).cast("double"))
    val idx = when(size(t) >= 2, sequence(lit(0), size(t) - 2))
      .otherwise(lit(Array.empty[Int]))
    docs
      .withColumn("n_bigrams", greatest(size(t) - 1, lit(0)).cast("long"))
      .withColumn("__sum_ps", aggregate(idx, lit(0L), (acc, i) => acc + ps(i)))
      .withColumn("n_oov", aggregate(idx, lit(0L), (acc, i) =>
        acc + when(element_at(biCol, key(i)).isNull, lit(1L)).otherwise(lit(0L))))
      .withColumn("avg_bigram_prob",
        when(col("n_bigrams") > 0, col("__sum_ps").cast("double") /
          (col("n_bigrams") * lit(scale)).cast("double")))
      .drop("__sum_ps")
  }

  /**
   * Pairwise Pearson correlation over numeric columns in ONE pass — the
   * multivariate companion of [[columnProfile]] (a drift monitor that
   * watches columns independently misses a broken JOINT relationship;
   * corr(price, quantity) flipping sign is a pipeline bug no marginal
   * histogram shows). One global aggregate computes every moment the
   * k·(k−1)/2 pairs need — n, Σx, Σx², Σxy — with map-side partials
   * (k + k·(k+1)/2 running sums, ONE exchange of ONE row however large
   * the table), then each pair's correlation is a scalar projection of
   * that row: corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²̄)·√(n·Σy²−Σy²̄)).
   *
   * Cross-engine determinism: the moments accumulate as EXACT decimals
   * (order-free), and each lands in the final doubles through a
   * decimal→STRING→double bridge — both engines print the exact decimal
   * and correctly-round the parse, where a direct wide-decimal→double
   * cast could double-round (the raw Σx² integer exceeds 2^53 at scale,
   * unlike the simple sums the DecM/DecV casts elsewhere keep under it).
   * The correlation expression itself is then identical IEEE arithmetic
   * over identical doubles. Constant columns yield null (zero variance).
   */
  def correlationMatrix(df: DataFrame, colNames: Seq[String],
      dec: String): DataFrame = {
    // STRUCTURAL single-scan guarantee: the finish unions k·(k−1)/2
    // projections of the moment row, and if those selected straight from
    // the un-materialized aggregate the "one scan of the table" claim
    // would rest on ReuseExchange deduplicating the identical aggregate
    // subtrees — a reuse miss at scale would re-scan the fact k·(k−1)/2
    // times. So the moment row is COLLECTED here (ONE row of decimals —
    // coordinator state, the same sanctioned class as centroid tables
    // and convergence scalars) and re-lifted as a local one-row frame;
    // the finish plan then contains no scan of `df` at all. The
    // streaming twin (s24) already reads its moment row from parquet
    // state, so only this batch path needed the materialization.
    val moments = correlationMoments(df, colNames, dec)
    val spark = df.sparkSession
    val row = moments.collect()
    val local = spark.createDataFrame(
      spark.sparkContext.parallelize(row.toIndexedSeq, 1), moments.schema)
    correlationFromMoments(local, colNames)
  }

  /** The ordered (x, y) pairs the moment/finish halves agree on. */
  def correlationPairs(colNames: Seq[String]): Seq[(String, String)] = for {
    i <- colNames.indices; j <- (i + 1) until colNames.size
  } yield (colNames(i), colNames(j))

  /** The one-pass moment row: n plus every Σx, Σx², Σxy as exact
    * decimals pinned to DECIMAL(38,8) — a MERGEABLE sketch (all sums, so
    * any partition/trigger slicing folds to the same row), the state a
    * streaming correlation monitor carries. */
  def correlationMoments(df: DataFrame, colNames: Seq[String],
      dec: String): DataFrame = {
    require(colNames.size >= 2, "need at least two columns to correlate")
    def d(c: String) = col(c).cast(dec)
    val aggs =
      colNames.flatMap(c => Seq(
        sum(d(c)).cast("decimal(38,8)").as(s"s_$c"),
        sum(d(c) * d(c)).cast("decimal(38,8)").as(s"ss_$c"))) ++
      correlationPairs(colNames).map { case (a, b) =>
        sum(d(a) * d(b)).cast("decimal(38,8)").as(s"sp_${a}_$b") }
    df.agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Finish: each pair's Pearson correlation as a scalar projection of
    * the moment row (see the bridge note above). */
  def correlationFromMoments(moments: DataFrame,
      colNames: Seq[String]): DataFrame = {
    def asD(name: String) = col(name).cast("string").cast("double")
    correlationPairs(colNames).map { case (a, b) =>
      val n = col("n").cast("double")
      val (sx, sy) = (asD(s"s_$a"), asD(s"s_$b"))
      val (sxx, syy, sxy) = (asD(s"ss_$a"), asD(s"ss_$b"), asD(s"sp_${a}_$b"))
      val den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
      moments.select(
        lit(a).as("col_x"), lit(b).as("col_y"), col("n"),
        when(den === 0.0, lit(null).cast("double"))
          .otherwise((n * sxy - sx * sy) / den).as("corr"))
    }.reduce(_ unionAll _)
  }
}
