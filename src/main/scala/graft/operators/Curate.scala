package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus curation/sampling — the data-mixing step of a
 * training pipeline. Everything derives from an md5-based uniform
 * fraction, so the SAME rows are selected on any engine, any cluster, any
 * partitioning, any day (unlike rand()/TABLESAMPLE): reproducible splits
 * and mixtures are what make 100-TB training runs auditable.
 *
 * All operators are pure row-level expressions — zero shuffle,
 * embarrassingly parallel.
 */
object Curate {

  /** Deterministic uniform [0,1) from the md5 of a key: the first 8 hex
    * chars as a 32-bit integer, divided by 2^32. Exact in double (both
    * operands < 2^53), identical in any engine with md5. */
  def hashFraction(key: Column): Column = {
    val h = md5(key)
    val int32 = conv(substring(h, 1, 8), 16, 10).cast("double")
    int32 / 4294967296.0
  }

  /**
   * Train/val/test split assignment: ordered (upperBound, label) cuts over
   * the hash fraction of (key | salt). The salt decouples this split from
   * any other hash use of the same key. E.g. cuts = (0.8,"train"),
   * (0.9,"val"), default "test".
   */
  def assignSplit(df: DataFrame, keyCol: String, salt: String,
      cuts: Seq[(Double, String)], default: String,
      outCol: String = "split"): DataFrame = {
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt)))
    val split = cuts.foldRight(lit(default): Column) { case ((ub, label), elseCol) =>
      when(frac < ub, lit(label)).otherwise(elseCol)
    }
    df.withColumn(outCol, split)
  }

  /**
   * Weighted mixture sampling: keep a row iff its hash fraction is below
   * its source's sampling rate (`rates`, else `defaultRate`) — the
   * per-source up/down-weighting of a training-data mixture, deterministic
   * per (key, source).
   */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
      rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((src, r), elseCol) =>
      when(col(sourceCol) === src, lit(r)).otherwise(elseCol)
    }
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|"), col(sourceCol)))
    df.filter(frac < rate)
  }

  /**
   * IMPORTANCE sampling — the PER-ROW counterpart of [[mixtureSample]]'s
   * per-source rates: keep a row with probability proportional to its
   * own weight (a quality/classifier score in [0, 1]), i.e. iff
   * hash_frac(key | salt) < min(1, weight · boost). This is the
   * quality-proportional downsampling step of modern curation pipelines
   * (keep high-quality documents at full rate, thin the tail in
   * proportion) — deterministic per key, so the same rows survive on
   * any engine or cluster, and the decision is a pure row-level
   * expression (zero shuffle at any scale).
   *
   * `boost` rescales weights into keep-probabilities (boost > 1 saturates
   * the best rows at 1). Output adds `p_keep` so downstream
   * importance-WEIGHTED estimators can reweight by 1/p_keep.
   */
  def importanceSample(df: DataFrame, keyCol: String, weightCol: String,
      boost: Double, salt: String): DataFrame = {
    require(boost > 0, "boost must be positive")
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt)))
    df.withColumn("p_keep", least(lit(1.0), col(weightCol) * boost))
      .filter(frac < col("p_keep"))
  }

  /**
   * Per-stratum QUOTA sampling — the fixed-budget counterpart of
   * [[mixtureSample]]'s rate-based mixing: keep exactly `quota(stratum)`
   * rows per stratum (e.g. "30k documents from each source for the
   * ablation set", "balance classes to the minority count"), chosen
   * deterministically as the stratum's lowest hash fractions (same
   * salted-md5 construction as [[assignSplit]] — the same rows win on
   * any engine, any cluster, any day; ties on the key, so the cut is a
   * total order). Strata smaller than their quota keep everything.
   *
   * One shuffle on the stratum; selection is a row_number window. The
   * declarative window form sorts each stratum once — right whenever a
   * stratum fits a task's spill budget (strata are few and coarse by
   * construction). For a stratum of billions of rows, pass a finite
   * `heapThreshold`: strata are pre-thinned by a per-partition bounded
   * heap on the hash fraction (each input partition emits at most its
   * stratum's quota rows — [[graft.operators.Ann]].topK's shape), and
   * the SAME window then ranks the ≤ partitions·quota survivors — the
   * giant stratum never funnels whole into one task's sort. The heap is
   * a pure pre-filter of non-winners, so both paths select identical
   * rows (QuotaHeapSpec proves heap == window on one input).
   *
   * OUTPUT SCHEMA: adds `sample_rank` (1-based rank within the stratum's
   * kept rows). The input must not already have a `sample_rank` column —
   * rather than silently replacing it, this throws.
   */
  def quotaSample(df: DataFrame, keyCol: String, stratumCol: String, salt: String,
      quotas: Seq[(String, Int)], defaultQuota: Int,
      heapThreshold: Option[Int] = None): DataFrame = {
    require(defaultQuota >= 0 && quotas.forall(_._2 >= 0), "quotas must be >= 0")
    require(!df.columns.contains("sample_rank"),
      "quotaSample adds a sample_rank column; input already has one")
    require(!df.columns.exists(Set("_qs_frac", "_qs_quota")),
      "quotaSample reserves _qs_frac/_qs_quota as internal columns")
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt)))
    val quota = quotas.foldRight(lit(defaultQuota): Column) { case ((s0, q), e) =>
      when(col(stratumCol) === s0, lit(q)).otherwise(e)
    }
    val pre = heapThreshold match {
      case Some(t) => heapPrefilter(df, keyCol, stratumCol, frac, quota, t)
      case None    => df.withColumn("_qs_frac", frac)
    }
    pre.withColumn("sample_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(stratumCol))
          .orderBy(col("_qs_frac").asc, col(keyCol).asc)))
      .filter(col("sample_rank") <= quota)
      .drop("_qs_frac")
  }

  /**
   * Per-partition bounded-heap pre-thinning for [[quotaSample]]: within
   * each input partition and stratum, keep the quota lowest-fraction
   * rows (plus ALL rows tying the boundary fraction). Any dropped row
   * has `quota` rows with STRICTLY smaller fraction in its own
   * partition, each of which outranks it in the final window regardless
   * of the key tie-break — so the prefilter can never change the
   * window's selection. This is the map-side combine of a distributed
   * top-k: narrow, no shuffle; the quota expression is evaluated per
   * row BEFORE the mapPartitions so the heap bound is a plain Int.
   * `heapThreshold` caps per-(partition, stratum) heap memory: quotas
   * above it keep all of that stratum's rows here (correct, just no
   * thinning). Boundary ties can exceed the cap only by the tie
   * multiplicity — with 2^-32-granular md5 fractions, essentially 0.
   */
  private def heapPrefilter(df: DataFrame, keyCol: String, stratumCol: String,
      frac: Column, quota: Column, heapThreshold: Int): DataFrame = {
    import org.apache.spark.sql.Row
    val withMeta = df.withColumn("_qs_frac", frac)
      .withColumn("_qs_quota", quota.cast("int"))
    val schema = withMeta.schema
    val stratumIdx = schema.fieldIndex(stratumCol)
    val fracIdx = schema.fieldIndex("_qs_frac")
    val quotaIdx = schema.fieldIndex("_qs_quota")
    val out = withMeta.mapPartitions { it =>
      // per-stratum MAX-heap on the fraction: the root is the current
      // worst keeper; a strictly better row evicts it, an exact tie with
      // the boundary is kept alongside (see correctness note above)
      val heaps = scala.collection.mutable.Map
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      val ord = Ordering.by[Row, Double](_.getDouble(fracIdx))
      val overflow = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { r =>
        val q = if (r.isNullAt(quotaIdx)) 0 else r.getInt(quotaIdx)
        if (q > heapThreshold) overflow += r // too big to heap: keep all
        else if (q > 0) {
          val h = heaps.getOrElseUpdate(r.get(stratumIdx),
            scala.collection.mutable.PriorityQueue.empty[Row](ord))
          if (h.size < q) h.enqueue(r)
          else {
            val worst = h.head.getDouble(fracIdx)
            val f = r.getDouble(fracIdx)
            if (f < worst) { h.dequeue(); h.enqueue(r) }
            else if (f == worst) h.enqueue(r) // boundary tie: keep both
          }
        }
      }
      (heaps.valuesIterator.flatMap(_.iterator) ++ overflow.iterator)
    }(org.apache.spark.sql.Encoders.row(schema))
    out.drop("_qs_quota")
  }

  /**
   * TOKEN-budget mixture — the budget counterpart of [[mixtureSample]]
   * (rate per source) and [[quotaSample]] (row count per stratum):
   * real mixture weights for a training run are TOKEN shares, not row
   * shares ("30B tokens of web, 5B of code"), and row quotas drift from
   * token targets whenever document lengths differ across sources.
   * Rows are taken per source in the deterministic salted-hash order
   * (the [[assignSplit]]/[[quotaSample]] construction — same rows on
   * any engine, any day), accumulating `tokensCol`, and a document is
   * IN budget iff its FIRST token sits below the cutoff (cum − own <
   * budget — the [[packSequences]] first-token discipline, so the
   * budget-crossing document is included and every budget is covered,
   * never undershot). Sources smaller than their budget keep all rows.
   *
   * One shuffle on the source; the cumsum is a window over the salted
   * order — engine-exact integer arithmetic, so an oracle replays the
   * cut bit-for-bit. OUTPUT SCHEMA: input columns + `n_tokens` +
   * `cum_tokens` (inclusive running total in selection order).
   *
   * SCALE PATH (`prefixPartitions = Some(p)`): the plain window funnels
   * each source into ONE task — the giant-source hazard every mixture
   * cut hits at 100 TB. The two-level form is a DISTRIBUTED PREFIX SUM:
   * rows land in p deterministic hash-fraction buckets (bucket =
   * floor(frac·p), monotone in the selection order, so bucket-then-
   * (frac, key) IS the global order), level 1 aggregates per-(source,
   * bucket) token totals (sources·p rows — coordinator state, the
   * centroid/codebook class), the driver prefix-sums them into bucket
   * offsets, and level 2 runs the cumsum window per (source, bucket) —
   * parallelism sources·p instead of sources — adding the broadcast
   * offset. Selection is BIT-IDENTICAL to the window form (spec-
   * asserted): same order, same totals, same first-token rule.
   */
  def tokenBudgetSample(df: DataFrame, keyCol: String, sourceCol: String,
      tokensCol: Column, salt: String, budgets: Seq[(String, Long)],
      defaultBudget: Long, prefixPartitions: Option[Int] = None): DataFrame = {
    require(defaultBudget >= 0 && budgets.forall(_._2 >= 0), "budgets must be >= 0")
    require(!df.columns.exists(Set("n_tokens", "cum_tokens")),
      "tokenBudgetSample adds n_tokens/cum_tokens; input already has them")
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt)))
    val budget = budgets.foldRight(lit(defaultBudget): Column) { case ((s0, b), e) =>
      when(col(sourceCol) === s0, lit(b)).otherwise(e)
    }
    withCumTokens(df.withColumn("n_tokens", tokensCol.cast("bigint")),
      keyCol, sourceCol, frac, prefixPartitions)
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** Shared cumsum core of [[tokenBudgetSample]] and [[epochExpand]]:
    * adds `cum_tokens` (inclusive running n_tokens total per source in
    * (frac, key) order). `prefixPartitions = None` is the plain window
    * (one task per source); `Some(p)` is the DISTRIBUTED PREFIX SUM —
    * bucket = floor(frac·p) is monotone in the selection order, so
    * bucket-then-(frac, key) IS the global order; per-(source, bucket)
    * totals reduce to coordinator state (sources·p rows, the centroid
    * class), the driver prefix-sums them into offsets, and the window
    * runs per (source, bucket) at sources·p parallelism. Bit-identical
    * output by construction (spec-asserted for p ∈ {1, 8, 64}). */
  private def withCumTokens(withTok: DataFrame, keyCol: String,
      sourceCol: String, frac: Column, prefixPartitions: Option[Int]): DataFrame =
    prefixPartitions match {
      case None =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(sourceCol)).orderBy(frac.asc, col(keyCol).asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        withTok.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      case Some(p) =>
        require(p >= 1, "prefixPartitions must be positive")
        val bucketed = withTok
          .withColumn("__frac", frac)
          .withColumn("__bucket",
            least(floor(col("__frac") * p).cast("int"), lit(p - 1)))
        val partials = bucketed.groupBy(col(sourceCol), col("__bucket"))
          .agg(sum(col("n_tokens")).as("__bt"))
          .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
        val offsets = partials.keys.map(_._1).toSeq.distinct.sorted.flatMap { s0 =>
          var acc = 0L
          (0 until p).map { b =>
            val off = acc
            acc += partials.getOrElse((s0, b), 0L)
            (s0, b, off)
          }
        }
        val sp = withTok.sparkSession
        import sp.implicits._
        val offDf = offsets.toDF(sourceCol, "__bucket", "__off")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(sourceCol), col("__bucket"))
          .orderBy(col("__frac").asc, col(keyCol).asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        bucketed
          .join(broadcast(offDf), Seq(sourceCol, "__bucket"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("__off"))
          .drop("__frac", "__bucket", "__off")
    }

  /**
   * EPOCH EXPANSION — the UPsampling half [[tokenBudgetSample]] cannot
   * express: when a source's token budget exceeds its corpus size (the
   * scarce high-quality source every mixture recipe repeats — "4 epochs
   * of wiki, 0.4 of web"), the source is served floor(budget / total)
   * FULL epochs plus a deterministic partial epoch covering the
   * remainder. Budgets are RATIONAL multiples of each source's own
   * token total (num/den, exact integer arithmetic — scale-free, so the
   * same recipe means the same epoch count at any corpus size), and the
   * partial epoch is the [[tokenBudgetSample]] cut (salted-hash order,
   * first-token rule) with the remainder as its budget. Downsampling
   * (num < den) degenerates to zero full epochs + the cut — exactly
   * tokenBudgetSample's selection, as an epoch-0 slice.
   *
   * Emits one row per (input row, epoch): epoch 0..k−1 are full
   * replicas, epoch k the partial slice. Row amplification is
   * floor(num/den)+1 — the recipe's token multiplier, a knob, never
   * data-dependent — via one narrow `sequence` explode; totals ride a
   * per-source aggregate joined back (source cardinality is tiny, so
   * the join broadcasts). OUTPUT SCHEMA: input columns + `n_tokens` +
   * `cum_tokens` + `epoch`.
   */
  def epochExpand(df: DataFrame, keyCol: String, sourceCol: String,
      tokensCol: Column, salt: String, multipliers: Seq[(String, (Long, Long))],
      defaultMultiplier: (Long, Long),
      prefixPartitions: Option[Int] = None): DataFrame = {
    (multipliers.map(_._2) :+ defaultMultiplier).foreach { case (n0, d0) =>
      require(n0 >= 0 && d0 >= 1, s"multiplier must be >=0 / >=1, got $n0/$d0")
    }
    require(!df.columns.exists(Set("n_tokens", "cum_tokens", "epoch")),
      "epochExpand adds n_tokens/cum_tokens/epoch; input already has them")
    val frac = hashFraction(concat(col(keyCol).cast("string"), lit("|" + salt)))
    def pick(f: ((Long, Long)) => Long): Column =
      multipliers.foldRight(lit(f(defaultMultiplier)): Column) {
        case ((s0, m), e) => when(col(sourceCol) === s0, lit(f(m))).otherwise(e)
      }
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokensCol.cast("bigint")).as("__src_tokens"))
    withCumTokens(df.withColumn("n_tokens", tokensCol.cast("bigint")),
      keyCol, sourceCol, frac, prefixPartitions)
      .join(broadcast(totals), sourceCol)
      // integer arithmetic throughout: `div` is integral division (the
      // Column `/` would detour through double and round)
      .withColumn("__num", col("__src_tokens") * pick(_._1))
      .withColumn("__den", pick(_._2))
      .withColumn("__budget", expr("__num div __den"))
      .withColumn("__full", expr("__budget div __src_tokens"))
      .withColumn("__rem", expr("__budget % __src_tokens"))
      .withColumn("__n_ep", col("__full") +
        when(col("cum_tokens") - col("n_tokens") < col("__rem"), lit(1L))
          .otherwise(lit(0L)))
      .filter(col("__n_ep") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n_ep") - 1)))
      .drop("__src_tokens", "__num", "__den", "__budget", "__full", "__rem", "__n_ep")
  }

  /**
   * Temperature-scaled mixture budgets — the multilingual/multi-source
   * rebalancing rule (mT5/XLM-R's α-scaled sampling): source i's share
   * of a total token budget is proportional to n_i^α with α < 1, so
   * head sources are down-weighted and tail sources up-weighted
   * relative to their natural token shares. Here α is expressed as
   * `sqrtApplications` ∈ {1, 2} (α = 0.5 or 0.25): IEEE `sqrt` is
   * correctly rounded, so n^α — and therefore every derived budget —
   * is bit-identical in any engine, which an arbitrary-α `pow` (libm
   * exp·log, NOT correctly rounded) could never guarantee. The weight
   * is frozen to an integer (floor(n^α · 1e6)) and each budget is an
   * exact integer ratio of it (BigInt product ÷ weight sum — no
   * overflow at any corpus size); Σ budgets ≤ totalBudget with
   * rounding loss < #sources tokens.
   *
   * One count aggregate over the corpus; the per-source weight table is
   * coordinator-sized (#sources rows) by definition. Feed the result to
   * [[tokenBudgetSample]] for the actual deterministic cut.
   */
  def temperatureBudgets(df: DataFrame, sourceCol: String, tokensCol: Column,
      totalBudget: Long, sqrtApplications: Int): Seq[(String, Long)] = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    require(sqrtApplications >= 1 && sqrtApplications <= 2,
      "alpha is limited to 0.5 / 0.25: sqrt is the only correctly-rounded power")
    val wExpr = (1 to sqrtApplications)
      .foldLeft(col("__n").cast("double"))((c, _) => sqrt(c))
    val rows = df.groupBy(col(sourceCol))
      .agg(sum(tokensCol.cast("bigint")).as("__n"))
      .select(col(sourceCol), floor(wExpr * lit(1000000.0)).cast("long").as("__w"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val totalW = rows.map(w => BigInt(w._2)).sum
    require(totalW > 0, "corpus holds no tokens: every budget would be 0/0")
    rows.toSeq.map { case (s0, w0) =>
      s0 -> ((BigInt(totalBudget) * w0) / totalW).toLong }
  }

  /**
   * Sequence packing — the concat-then-chunk construction of fixed
   * token-budget training examples: documents are dealt to `nShards`
   * deterministic shards (hash fraction, like [[assignSplit]]: same
   * shards on any engine/cluster/day), CONCATENATED per shard in id
   * order into one token stream, and each `budget`-sized window of that
   * stream is a pack. A document belongs to the pack containing its
   * first token (a long doc can span several packs — that is concat
   * packing's semantics, not a defect). Returns per-(shard, pack) doc
   * counts and token sums.
   *
   * One shuffle on the shard; the running offset is a window cumsum,
   * pack assignment an integer division — all engine-exact, so the
   * oracle replays it bit-for-bit. Shard count bounds window-partition
   * size at scale (choose nShards so a shard's docs fit a task).
   */
  def packSequences(docs: DataFrame, idCol: String, tokenCountCol: Column,
      nShards: Int, budget: Long): DataFrame = {
    require(nShards >= 1 && budget >= 1, "nShards and budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol), tokenCountCol.cast("bigint").as("n_tokens"),
        // frac * nShards is exact: int32 * nShards < 2^53, /2^32 is a
        // power-of-two scale — both engines floor the same double
        floor(hashFraction(concat(col(idCol).cast("string"), lit("|pack")))
          * nShards).cast("bigint").as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${budget}L"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  /**
   * Per-key ordered sequences — the autoregressive-training corpus shape
   * (one example per key: its events in time order), and the only
   * HOLISTIC aggregate in the engine (order can't partially reduce).
   *
   * One shuffle on the key; collect_list runs as an ObjectHashAggregate
   * with map-side partial collection, the sort is per-group
   * O(n log n) AFTER the exchange. `maxLen` caps each sequence (every
   * training pipeline caps context length) — the cap bounds the OUTPUT,
   * not the aggregation state, so a pathologically hot key still
   * collects before slicing; keys like user/session ids are
   * activity-bounded by nature, which is what makes collect_list the
   * right tool here and NOT for open-domain keys like tokens.
   *
   * Ordering ties break on `payloadCol` after `orderCols` (total order
   * when (orderCols, payload) is unique per key → deterministic output
   * at any parallelism).
   */
  /**
   * CURRICULUM PACKING — [[packSequences]]' shard/budget discipline
   * with a DIFFICULTY-PHASE axis (curriculum learning, Bengio et al.
   * 2009: present easy examples first): every pack is single-phase, so
   * a training loader consumes packs in (phase, shard, pack_id) order
   * and difficulty is monotone across the run, while WITHIN a phase the
   * salted-hash shard assignment keeps examples well mixed (phase
   * boundaries order the curriculum; the hash de-correlates everything
   * else — ordering by raw difficulty inside a phase would feed the
   * model near-sorted data, the failure mode curricula are tuned to
   * avoid). `phase` = how many ascending `thresholds` the document's
   * difficulty has passed — an all-integer verdict any engine replays.
   *
   * Scale shape: identical to [[packSequences]] — one narrow pass
   * computes (phase, shard), ONE exchange on (phase, shard) feeds the
   * running-token window, cut at `budget`, and the per-pack rollup
   * reuses the window's partitioning. A document larger than `budget`
   * still lands in exactly one pack (its own), same as c5.
   */
  def curriculumPack(docs: DataFrame, idCol: String, tokenCountCol: Column,
      difficultyCol: Column, thresholds: Seq[Long], nShards: Int,
      budget: Long): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      "thresholds must be nonempty and ascending")
    require(nShards >= 1 && budget >= 1, "nShards and budget must be positive")
    val phase = thresholds.map(t => when(difficultyCol >= t, 1).otherwise(0))
      .reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("phase", "shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol), tokenCountCol.cast("bigint").as("n_tokens"),
        phase.as("phase"),
        floor(hashFraction(concat(col(idCol).cast("string"), lit("|cur")))
          * nShards).cast("bigint").as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${budget}L"))
      .groupBy("phase", "shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
  }

  def sequences(df: DataFrame, keyCol: String, orderCols: Seq[String],
      payloadCol: String, maxLen: Int): DataFrame = {
    require(maxLen >= 1, "maxLen must be at least 1")
    val ordered = sort_array(collect_list(
      struct((orderCols :+ payloadCol).map(col): _*)))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), ordered.as("o"))
      .select(col(keyCol), col("n_events"),
        array_join(
          transform(slice(col("o"), 1, maxLen),
            x => x.getField(payloadCol).cast("string")),
          ",").as("seq"))
  }

  /** One md5'd word-n-gram row per (optional id, gram), built NARROW via
    * the shared [[graft.functions.text.wordShingles]] (normalize → split
    * once per row, shingles over the projected token array — the l1
    * discipline, zero shuffle; under-n-word docs yield no rows). */
  private def gramTable(df: DataFrame, idCol: Option[String], textCol: String,
      n: Int): DataFrame =
    df.select((idCol.map(col).toSeq :+
        graft.functions.text.words(col(textCol)).as("ws")): _*)
      .select((idCol.map(col).toSeq :+
        explode(graft.functions.text.wordShingles(col("ws"), n)).as("g")): _*)
      .select((idCol.map(col).toSeq :+ md5(col("g")).as("gh")): _*)

  /**
   * Benchmark decontamination — flag every training document that shares
   * at least one word `n`-gram with an evaluation/benchmark set. Eval
   * questions leaking into training data silently inflate benchmark
   * scores; every serious training pipeline runs this gate and drops (or
   * audits) the flagged docs. The reference has no analog — this is one
   * of the mandated LLM-pipeline additions.
   *
   * Scale shape: the benchmark side is TINY by nature (eval sets are
   * KBs–MBs against a 100-TB corpus), so its distinct gram hashes
   * BROADCAST; the corpus-side gram build stays narrow, and the single
   * exchange carries only (doc id, matched gram) pairs — rows exist only
   * for actual overlaps, not for the corpus. Grams travel as md5 hex
   * (engine-identical, oracle-friendly); at extreme scale swap the join
   * key to the 8-byte `graft_md5_prefix64` form — same plan, 1/4 the
   * bytes.
   *
   * Returns one row per CONTAMINATED doc: (idCol, n_shared_grams), the
   * distinct shared-gram count an auditor ranks by. Anti-join the corpus
   * against it to drop them.
   */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be positive")
    val bench = gramTable(benchmark, None, benchTextCol, n).distinct()
    gramTable(corpus, Some(idCol), textCol, n)
      .join(broadcast(bench), "gh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  /** Unigram counts (w, c1) from a token-array column — one narrow
    * explode + one count shuffle; shared by the batch collocation
    * scorer (t16) and the streaming dictionary fold (s17) so the two
    * counts cannot drift. */
  def unigramCounts(toks: DataFrame, wsCol: String): DataFrame =
    toks.select(explode(col(wsCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))

  /** Adjacent-bigram counts (w1, w2, n_xy) from a token-array column —
    * the two shifted slices zip into pairs, narrow until the count
    * shuffle (bounded by vocabulary², never corpus-sized). */
  def bigramCounts(toks: DataFrame, wsCol: String): DataFrame =
    toks.select(explode(zip_with(
        slice(col(wsCol), lit(1), size(col(wsCol)) - 1),
        slice(col(wsCol), lit(2), size(col(wsCol)) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))

  /**
   * SEMANTIC decontamination — [[flagContaminated]]'s embedding-space
   * twin: flag corpus items whose embedding is near-identical (cosine >=
   * `threshold`) to ANY benchmark item, catching paraphrased leakage no
   * lexical n-gram overlap can see (the l12/SemDeDup rationale applied
   * to eval protection).
   *
   * Scale shape: a benchmark is small BY NATURE (the
   * benchmarkGramHashes rationale), so it broadcasts whole and the
   * corpus pass is one narrow scan — no shuffle until the (tiny)
   * flagged set's per-doc max window. Scoring is the standard two-phase
   * cheap-then-exact: the native double cosine with a 0.01 margin
   * prunes the broadcast pairs, the exact decimal cosine decides, with
   * per-row exact norms computed before the pairing (the
   * nearDupPairsInBlocks contract — output identical to scoring every
   * pair exactly).
   *
   * Returns one row per CONTAMINATED corpus item: (idCol, bench_id,
   * cosine) for its STRONGEST benchmark hit (max cosine, ties to the
   * smaller bench id).
   */
  def flagSemanticContamination(corpus: DataFrame, idCol: String,
      vecCol: String, benchmark: DataFrame, benchIdCol: String,
      benchVecCol: String, threshold: Double): DataFrame = {
    graft.plans.VectorExpressions.ensureRegistered(corpus.sparkSession)
    def dot(x: Column, y: Column) = call_function("graft_dot", x, y)
    def dotX(x: Column, y: Column) = call_function("graft_dot_exact", x, y)
    val c = corpus.select(col(idCol), col(vecCol).as("__v"),
      dot(col(vecCol), col(vecCol)).as("__nsq"),
      dotX(col(vecCol), col(vecCol)).as("__xnsq"))
    val b = benchmark.select(col(benchIdCol).as("bench_id"),
      col(benchVecCol).as("__bv"),
      dot(col(benchVecCol), col(benchVecCol)).as("__bnsq"),
      dotX(col(benchVecCol), col(benchVecCol)).as("__bxnsq"))
    val approx = dot(col("__v"), col("__bv")) / sqrt(col("__nsq") * col("__bnsq"))
    val hits = c.crossJoin(broadcast(b))
      .filter(col("__nsq") === 0.0 || col("__bnsq") === 0.0 ||
        approx >= threshold - 0.01)
      .select(col(idCol), col("bench_id"),
        graft.functions.vectors.cosineFromParts(dotX(col("__v"), col("__bv")),
          col("__xnsq"), col("__bxnsq")).as("cosine"))
      .filter(col("cosine") >= threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("cosine").desc, col("bench_id").asc)
    hits.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct md5 word-n-gram hashes of a benchmark set, collected to a
    * driver set for [[exciseContaminatedSpans]]' broadcast map. Eval
    * sets are KBs–MBs by nature, so this is coordinator-sized by
    * definition (the t11 model-collect rationale); a benchmark too big
    * to collect should use [[flagContaminated]]'s join shape instead. */
  def benchmarkGramHashes(benchmark: DataFrame, benchTextCol: String,
      n: Int): Set[String] =
    gramTable(benchmark, None, benchTextCol, n).distinct()
      .collect().map(_.getString(0)).toSet

  /**
   * SPAN-LEVEL decontamination — the surgical form of
   * [[flagContaminated]]'s document gate: rather than DROP a long
   * document for one leaked eval question, EXCISE exactly the
   * contaminated token spans (every token covered by a
   * benchmark-matching word n-gram) and keep the rest — how production
   * pipelines decontaminate high-value long documents where whole-doc
   * dropping wastes 99% clean text.
   *
   * FULLY NARROW: the benchmark's gram hashes ride along as ONE array
   * literal probed through the native `graft_in_set` hash set. Measured
   * decomposition of the original 83 s at sf0.1: the quadratic
   * per-position exists-probe mask was ~78 s of it (interpreted
   * higher-order lambda cost on exactly the fully-covered docs this
   * operator exists for — replaced by the linear covered-array algebra
   * below), and the map-literal probe accounted for the rest (4.97 s
   * with the linear mask; 1.32 s with the hash set)
   * and the whole mask — match starts, covered positions, span count,
   * kept tokens — is per-row array algebra over the token array. Zero
   * shuffle, zero join: the 100-TB pass is map-only. Per-row cost is
   * O(tokens × matched-starts); clean documents (the overwhelming
   * majority) pay one hash probe per gram.
   *
   * Output per input row: idCol, n_tokens, n_removed, n_spans (maximal
   * covered runs), text_clean (kept tokens of the NORMALIZED text,
   * space-joined — the same token stream every downstream operator
   * tokenizes to). A fully-covered document yields text_clean = "".
   */
  def exciseContaminatedSpans(corpus: DataFrame, idCol: String,
      textCol: String, benchGramHashes: Set[String], n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be positive")
    graft.plans.VectorExpressions.ensureRegistered(corpus.sparkSession)
    val benchArr = typedLit(benchGramHashes.toSeq.sorted)
    val ws = graft.functions.text.words(col(textCol))
    val empty = lit(Array.empty[Int])
    exciseCovered(
      corpus.select(col(idCol), ws.as("__ws"))
        .withColumn("__nt", size(col("__ws")))
        .withColumn("__starts", when(col("__nt") >= n,
          filter(sequence(lit(0), col("__nt") - n), i =>
            call_function("graft_in_set",
              md5(concat_ws(" ", slice(col("__ws"), i + 1, lit(n)))), benchArr)))
          .otherwise(empty)),
      idCol, n)
  }

  /** The shared covered-position excision algebra (t12/l24): staged
    * rows carry (idCol, __ws token array, __nt, __starts = 0-based hot
    * gram starts) → (idCol, n_tokens, n_removed, n_spans, text_clean).
    * Covered positions as ONE sorted distinct array: |starts|·n
    * elements flattened, then hash-based array_except — linear, where
    * a per-position `exists over starts` probe is O(tokens·starts),
    * quadratic exactly on the fully-covered documents the operator
    * exists to excise. */
  private def exciseCovered(staged: DataFrame, idCol: String, n: Int): DataFrame = {
    val empty = lit(Array.empty[Int])
    staged
      .withColumn("__idx", when(col("__nt") > 0,
        sequence(lit(0), col("__nt") - 1)).otherwise(empty))
      .withColumn("__cov", sort_array(array_distinct(flatten(
        transform(col("__starts"), i => sequence(i, i + lit(n - 1)))))))
      .withColumn("__kept", array_except(col("__idx"), col("__cov")))
      .select(
        col(idCol),
        col("__nt").cast("long").as("n_tokens"),
        (col("__nt") - size(col("__kept"))).cast("long").as("n_removed"),
        // maximal covered runs = positions in __cov not preceded by
        // their predecessor (O(|cov|), element_at is O(1) on arrays)
        when(size(col("__cov")) === 0, lit(0)).otherwise(
          size(filter(sequence(lit(0), size(col("__cov")) - 1), k =>
            (k === 0) || (element_at(col("__cov"), k + 1) =!=
              element_at(col("__cov"), k) + 1))))
          .cast("long").as("n_spans"),
        array_join(transform(col("__kept"),
          j => element_at(col("__ws"), j + 1)), " ").as("text_clean"))
  }

  /**
   * GLOBAL repeated-substring EXCISION (the Lee et al. 2022
   * "Deduplicating Training Data Makes Language Models Better"
   * ExactSubstr pass — the one dedup modality between the unit tiers:
   * t6 drops repeated LINES by unit frequency, [[graft.operators.Dedup
   * .sharedSpans]] FINDS long spans shared by a PAIR, this removes
   * every span repeated corpus-WIDE in place): every token covered by
   * a word `n`-gram whose TOTAL occurrence count across the corpus
   * reaches `minCount` is excised; everything else survives. A span
   * longer than `n` repeated anywhere is covered end-to-end by its own
   * repeated `n`-grams, so one gram size handles all span lengths ≥ n.
   *
   * Scale shape — NO pair join anywhere, which is exactly why this
   * modality scales where a pair-span report cannot: positional grams
   * build NARROW (the l11 discipline: projected split + transform +
   * posexplode, zero shuffle); ONE gram-hash shuffle counts total
   * occurrences (map-side partial combine; the hot set is Zipf-tiny
   * relative to the corpus); hot occurrences group per doc into a
   * sorted start array (doc-bounded rows, one doc-keyed shuffle); the
   * excision itself is [[exciseContaminatedSpans]]'s linear
   * covered-array algebra, map-only. Total: two shuffles + one
   * doc-keyed join, every term linear in corpus grams or hot
   * occurrences — never corpus² and never k² on a self-repeating doc.
   * No df-cap is needed: caps exist to stop Σ bucket² PAIR blowup, and
   * nothing here pairs — a gram repeated a million times contributes
   * exactly its million (id, pos) rows.
   */
  def exciseRepeatedSpans(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Long): DataFrame = {
    require(n >= 1, "n-gram size must be positive")
    require(minCount >= 2, "minCount < 2 would excise every token")
    val empty = lit(Array.empty[Int])
    val ws = corpus
      .select(col(idCol), graft.functions.text.words(col(textCol)).as("__ws"))
      .withColumn("__nt", size(col("__ws")))
    // positional gram table (id, 0-based start, md5(gram)) — narrow
    val g = ws.filter(col("__nt") >= n).select(col(idCol),
      posexplode(transform(sequence(lit(1), col("__nt") - (n - 1)),
        i => md5(concat_ws(" ", slice(col("__ws"), i, lit(n))))))
        .as(Seq("pos", "gh")))
    val hot = g.groupBy("gh").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount).select("gh")
    val starts = g.join(hot, Seq("gh"))
      .groupBy(idCol).agg(sort_array(collect_set(col("pos"))).as("__starts"))
    exciseCovered(
      ws.join(starts, Seq(idCol), "left")
        .withColumn("__starts", coalesce(col("__starts"), empty)),
      idCol, n)
  }
}
