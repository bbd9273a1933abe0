package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/**
 * Enrichment operators, re-expressing the reference's enricher service:
 *
 *  - [[extractSkills]]: services/enricher/skills_extractor.py — dictionary
 *    alias→canonical extraction over free text. The spaCy PhraseMatcher
 *    path matches phrases of ANY length, so token n-grams are generated up
 *    to the longest alias in the dictionary (not just bigrams).
 *  - [[classifyByRules]]: services/common/seniority_extractor.py — ordered
 *    word-boundary regex keyword rules, first hit wins.
 *  - [[fuzzyJoin]]: services/enricher/company_matcher.py — fuzzy name
 *    matching accepted by NORMALIZED similarity ratio (fuzz.ratio >= 80,
 *    company_matcher.py:139), done scalably as a *blocked* similarity join
 *    (never a cross join): equality on a blocking key, edit distance only
 *    inside blocks.
 *  - [[editBlockKeys]]: deletion-neighborhood blocking for edit distance
 *    <= 1 — a string and all its 1-character-deletion variants. Any two
 *    strings within levenshtein 1 share at least one key, so the blocking
 *    is EXACT (100% recall), and key cardinality grows with the data
 *    (unlike a fixed suffix/prefix key, which goes quadratic at scale).
 *
 * Scale notes: extractSkills is explode + broadcast-join + one groupBy on
 * the doc id (a single shuffle, map-side combinable); classifyByRules is a
 * pure row-level expression; fuzzyJoin's cost is Σ block².
 */
object Enrich {

  /**
   * Dictionary skills extraction. `dict` maps alias → canonical; aliases
   * are matched against token n-grams of every length up to the longest
   * alias (skills_extractor.py:215 PhraseMatcher semantics). Returns
   * (idCol, skills_csv): sorted distinct canonical skills, comma-joined
   * (portable across engines and hash-stable).
   */
  def extractSkills(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, dict: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val maxN = dict.map(_._1.split(" ").length).max
    val dictDf = broadcast(dict.toDF("alias", "canonical"))
    // NARROW gram build: the token array is projected once per document,
    // and each n's grams come from a transform/slice over that projected
    // column — all map-side, zero shuffle, so the only exchange in the
    // whole operator is the final groupBy's, carrying dictionary MATCHES
    // rather than the tokenized corpus. (The quadratic re-evaluation trap
    // only applies to lambdas over an INLINE split; a projected array
    // column is materialized once per row.)
    val ws = docs.select(col(idCol), T.words(col(textCol)).as("ws"))
    val gramArrays = (1 to maxN).map { n =>
      if (n == 1) col("ws")
      else
        // guard: sequence(1, x) steps DOWNWARD for x <= 0
        when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)),
            i => array_join(slice(col("ws"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))
    }
    ws.select(col(idCol), explode(flatten(array(gramArrays: _*))).as("gram"))
      .join(dictDf, col("gram") === col("alias"))
      .groupBy(idCol)
      .agg(array_join(array_sort(collect_set(col("canonical"))), ",").as("skills_csv"))
  }

  /** Ordered (pattern → label) regex rules; first match wins, else default. */
  def classifyByRules(textCol: Column, rules: Seq[(String, String)],
      default: String): Column =
    rules.foldRight(lit(default): Column) { case ((pattern, label), elseCol) =>
      when(lower(textCol).rlike(pattern), lit(label)).otherwise(elseCol)
    }

  /** Length-normalized similarity ratio in [0,100], 2dp — the engine-side
    * analog of fuzz.ratio (company_matcher.py:19 threshold 80): a 1-edit
    * difference means much more for a 5-char name than a 50-char one. */
  def similarityRatio(a: Column, b: Column): Column =
    round(lit(100.0) * (lit(1.0) -
      levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double")), 2)

  /**
   * Deletion-neighborhood blocking keys up to `depth` deletions (FastSS,
   * Bocek et al. 2007): the string itself plus every variant reachable by
   * deleting at most `depth` characters. Two strings within levenshtein
   * `depth` ALWAYS share at least one key, so a join on the exploded keys
   * has exact recall for lev <= depth, while key cardinality grows with
   * the data (unlike a fixed prefix/suffix key, which goes quadratic at
   * scale). Key count is O(len^depth / depth!) per string — fine for the
   * short name strings fuzzy matching targets; depth is chosen from the
   * accept threshold via [[maxEditsForRatio]].
   *
   * Backed by the native graft.plans.DeletionNeighborhood expression: the
   * iterative build ("delete one char from each previous-level variant,
   * dedup, repeat") composed from array built-ins re-embeds each level's
   * expression tree in the next, multiplying evaluation ~7× per depth
   * level; the native BFS does the work once per row inside whole-stage
   * codegen.
   */
  def deletionNeighborhood(name: Column, depth: Int): Column = {
    graft.plans.VectorExpressions.ensureRegistered(SparkSession.active)
    call_function("graft_del_neighborhood", name, lit(depth))
  }

  /** Depth-1 neighborhood: the string plus each 1-deletion variant. */
  def editBlockKeys(name: Column): Column = deletionNeighborhood(name, 1)

  /** [[deletionNeighborhood]] as 64-bit key hashes (`array<long>`) — the
    * form [[fuzzySelfMatch]] blocks on: an 8-byte join key, and no
    * per-variant strings allocated in the ~len^d×-amplified explode. A
    * hash collision can only MERGE two blocks (the ratio filter drops the
    * extra pairs), never lose a true one. */
  def deletionNeighborhoodHashes(name: Column, depth: Int): Column = {
    graft.plans.VectorExpressions.ensureRegistered(SparkSession.active)
    call_function("graft_del_neighborhood_hash", name, lit(depth))
  }

  /**
   * Smallest neighborhood depth that makes a `ratio >= minRatio` accept
   * rule EXACT under deletion-neighborhood blocking, given the longest
   * name in the data: a qualifying pair (a, b) has
   * lev <= (1 - minRatio/100) * max(|a|,|b|), and |b| <= |a| + lev, so
   * depth = floor(maxLen * (100 - minRatio) / 100) covers every pair
   * whose longer side is at most maxLen.
   */
  def maxEditsForRatio(maxLen: Int, minRatio: Double): Int =
    math.floor(maxLen * (100.0 - minRatio) / 100.0).toInt

  /**
   * Blocked fuzzy join: candidates share `blockKey` (equality → plain
   * shuffle join); `edit_dist` and `sim_ratio` are evaluated only inside
   * blocks, and matches are accepted by normalized ratio (reference
   * semantics) AND edit distance.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftName: Column,
      rightName: Column, blockLeft: Column, blockRight: Column,
      maxDist: Int, minRatio: Double): DataFrame =
    left.join(right, blockLeft === blockRight)
      .withColumn("edit_dist", levenshtein(leftName, rightName))
      .withColumn("sim_ratio", similarityRatio(leftName, rightName))
      .filter(col("edit_dist") <= maxDist && col("sim_ratio") >= minRatio)

  /**
   * Fuzzy self-match with exact-recall deletion-neighborhood blocking:
   * finds every (id1 < id2) pair with `lev <= maxEdits` and
   * `sim_ratio >= minRatio`, once, with both measures in the output.
   * Picking `maxEdits = maxEditsForRatio(maxNameLen, minRatio)` makes the
   * lev bound vacuous — the accept rule is then the reference's plain
   * normalized-ratio threshold (company_matcher.py:139 `fuzz.ratio >= 80`)
   * with no recall loss.
   *
   * RECALL CAVEAT — the exactness claim is conditional on the skew cap:
   * any blocking key whose bucket exceeds `maxBucket` is dropped with ALL
   * its pairs (e.g. > maxBucket literally identical names), by design —
   * one over-popular normalized name must not create a quadratic hot
   * block. On real name data such keys are placeholder junk ("unknown",
   * "n/a"), but when auditing recall, measure what the cap removed:
   * count the explode output grouped by key hash, filtered to
   * `> maxBucket` — the same first exchange this method plans, so the
   * audit costs one aggregation over it.
   *
   * Scale guards, in deliberate order (each one measured against its
   * naive alternative at sf0.1):
   *  - the key table carries (id, hash64(variant)) ONLY — an 8-byte join
   *    key, no variant strings allocated in the amplified stage or moved
   *    through the exchange;
   *  - the WHOLE blocking pipeline — skew-cap count, cap filter, and both
   *    self-join sides — hangs off ONE exchange on the key hash: the
   *    windowed `count(*) over (partition by kh)` partitions exactly like
   *    the join, and the two join sides are identical subplans, so
   *    ReuseExchange leaves a single map pass over the exploded keys
   *    (separate count/anti-join pipelines re-ran the explode and
   *    tripled the stage's allocation pressure);
   *  - the skew cap drops over-popular keys BEFORE pair generation (one
   *    over-popular normalized name — "unknown", "n/a" — must not create
   *    a quadratic hot block);
   *  - the shuffle_hash hint is load-bearing: Catalyst sizes join inputs
   *    from the SCAN, cannot see the ~len^d× Generate amplification, and
   *    would broadcast the entire multi-million-row key table (measured
   *    88 s vs ~2 s at sf0.1);
   *  - pairs sharing several keys collapse in a distinct() over the two
   *    long ids (partial-agg'd map-side, so the multiplicity never
   *    reaches the shuffle in full);
   *  - names re-attach AFTER the dedup, via joins against the (small)
   *    input table on the long id.
   */
  /**
   * The recall audit [[fuzzySelfMatch]]'s scaladoc prescribes, as a
   * runnable query: the blocking keys whose buckets exceed `maxBucket` —
   * every pair inside them is DROPPED by the cap — with their sizes and
   * the distinct input rows affected. Empty result = the exact-recall
   * guarantee is unconditional on this input. Same key build as the
   * match itself (one aggregation over one exchange); run it alongside
   * any production match whose recall matters.
   */
  def fuzzyCappedKeys(names: DataFrame, idCol: String, nameCol: String,
      maxEdits: Int = 1, maxBucket: Int = 1000): DataFrame = {
    val keys = names.select(col(idCol).as("id"),
        explode(deletionNeighborhoodHashes(col(nameCol), maxEdits)).as("kh"))
    keys.groupBy("kh")
      .agg(count(lit(1)).as("n_bucket"), countDistinct(col("id")).as("n_ids"))
      .filter(col("n_bucket") > maxBucket)
  }

  /** `requireSide`: name of a BOOLEAN column on `names` — when set, only
    * pairs with AT LEAST ONE flagged side materialize (the flag rides the
    * key table into the self-join condition, l10's tag-in-join
    * discipline), so unflagged↔unflagged pairs never exist past the
    * candidate join. This is the incremental-maintenance mode: flag a
    * new batch and the quadratic old↔old pair space is never re-entered. */
  def fuzzySelfMatch(names: DataFrame, idCol: String, nameCol: String,
      minRatio: Double, maxEdits: Int = 1, maxBucket: Int = 1000,
      requireSide: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sideCols = requireSide.toSeq.map(col)
    val base = names.select(
      (Seq(col(idCol).as("id"), col(nameCol).as("name")) ++ sideCols): _*)
    // The explode amplifies each row ~len^maxEdits/maxEdits!× — by far the
    // heaviest map stage — so spread the (small) name table across the
    // cluster FIRST: a name dim often arrives as a handful of splits, and
    // without this the amplification runs at the scan's parallelism. The
    // EXPLICIT partition count matters: a bare repartition(col) is
    // AQE-coalesced right back to one partition (the pre-explode bytes
    // are tiny; AQE cannot see the Generate amplification) — measured 93 s
    // single-task vs ~3 s spread.
    val keys = base
      .repartition(graft.config.Knobs.amplifiedShufflePartitions(base.sparkSession), col("id"))
      .select((Seq(col("id"),
        explode(deletionNeighborhoodHashes(col("name"), maxEdits)).as("kh")) ++ sideCols): _*)
    val capped = keys
      .withColumn("n_bucket", count(lit(1)).over(Window.partitionBy("kh")))
      .filter(col("n_bucket") <= maxBucket)
      .select((Seq(col("id"), col("kh")) ++ sideCols): _*)
      .hint("shuffle_hash")
    val baseCond = col("a.kh") === col("b.kh") && col("a.id") < col("b.id")
    val cond = requireSide match {
      case Some(c) => baseCond && (col(s"a.$c") || col(s"b.$c"))
      case None => baseCond
    }
    val cand = capped.as("a")
      .join(capped.as("b"), cond)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cand
      .join(base.select(col("id").as("id1"), col("name").as("name1")), "id1")
      .join(base.select(col("id").as("id2"), col("name").as("name2")), "id2")
      .withColumn("edit_dist", levenshtein(col("name1"), col("name2")))
      .withColumn("sim_ratio", similarityRatio(col("name1"), col("name2")))
      .filter(col("edit_dist") <= maxEdits && col("sim_ratio") >= minRatio)
      .select("id1", "id2", "name1", "name2", "edit_dist", "sim_ratio")
  }

  // --------------------------------------------------- compensation text
  // Free-text compensation parsing (reference: normalize.py:125 repairs
  // already-NUMERIC salary bounds; real job feeds carry them as text —
  // '$52,000 - $64,000 per year', '45k - 52k USD / year', '$30 - $45
  // per hour' — so the extractor ahead of it must parse currency, the
  // range, and the pay period, then ANNUALIZE to one comparable unit).
  // All four pieces are pure regexp/arithmetic built-ins sharing one
  // codegen'd projection, each independently oracle-replayable.

  /** ISO currency from the symbol, falling back to a word code. */
  def compCurrency(c: Column): Column =
    when(c.contains("$"), "USD")
      .when(c.contains("€"), "EUR")
      .when(c.contains("£"), "GBP")
      .when(lower(c).rlike("\\busd\\b"), "USD")
      .otherwise("UNK")

  /** Pay period: hour / month / year (the default). */
  def compPeriod(c: Column): Column =
    when(lower(c).rlike("hour|/hr|\\bhr\\b"), "hour")
      .when(lower(c).rlike("month|/mo\\b"), "month")
      .otherwise("year")

  /** Rows-per-year multiplier for [[compPeriod]]: 2080 work hours
    * (40 h × 52 wk), 12 months, or 1. */
  def compAnnualFactor(c: Column): Column =
    when(compPeriod(c) === "hour", lit(2080L))
      .when(compPeriod(c) === "month", lit(12L))
      .otherwise(lit(1L))

  /** One numeric token → amount: commas stripped, 'k' suffix ×1000. */
  private def compAmount(tok: Column): Column =
    when(tok.endsWith("k"),
        regexp_replace(tok, "[,k]", "").cast("long") * 1000L)
      .otherwise(regexp_replace(tok, ",", "").cast("long"))

  /** [lo, hi] bounds in the string's own pay period: the first two
    * number tokens ('52,000', '45k', '30'); a single number means
    * lo = hi; no number means nulls (malformed, filterable). */
  def compBounds(c: Column): Column = {
    val ns = regexp_extract_all(lower(c), lit("[0-9][0-9,]*k?"), lit(0))
    // CaseWhen evaluates branches lazily, so the 1-based element_at
    // never sees an empty array
    when(size(ns) === 0, lit(null).cast("array<bigint>"))
      .otherwise(array(
        compAmount(element_at(ns, 1)),
        compAmount(element_at(ns, least(size(ns), lit(2))))))
  }
}
