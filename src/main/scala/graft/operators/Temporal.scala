package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time operators: point-in-time (as-of) join and gap-based
 * sessionization — the two temporal primitives the reference's daily
 * incremental model implies but its Postgres layer computes row-at-a-time
 * (services/normalizer/db_operations.py:334 keeps only latest state;
 * a feature/training pipeline needs "state AS OF each event").
 *
 * Both are single-shuffle declarative plans — no inequality join, no
 * driver-side iteration — so they hold their shape at 100 TB.
 */
object Temporal {

  /**
   * As-of join: for every left row, attach the single right row with the
   * greatest `rightTs <= leftTs` (the latest state at or before the
   * event) for the same key — nulls where no state precedes the event.
   *
   * Spark has no ASOF JOIN operator; the naive encodings both fail at
   * scale: an inequality join `l.key = r.key AND r.ts <= l.ts` explodes
   * to every (event, earlier-state) pairing before a per-event argmax
   * prunes it (quadratic per key), and a per-event scalar subquery is not
   * plannable at all. This is instead the union-merge form: tag states
   * prio=0 and events prio=1, union by name, and run ONE window
   * `last(_state, ignoreNulls) over (partition by key order by ts, prio
   * rows unbounded preceding)` — a single Exchange on the key plus one
   * sort, the same cost as a sort-merge join of the two tables, linear
   * in |events| + |states|. At equal timestamps states sort BEFORE
   * events (prio 0 < 1), giving the inclusive `<=` the contract states.
   *
   * Requirements: `right` must be unique per (keys, rightTs) — otherwise
   * "the" state at a timestamp is ill-defined; pre-aggregate duplicates.
   * When the state struct is ORDERABLE (no map-typed state columns) the
   * window ordering includes `_state` as a final key, so a
   * contract-violating input degrades to a DETERMINISTIC pick (the
   * largest state struct at the duplicated timestamp) rather than
   * whichever duplicate happened to sort last; with a non-orderable
   * state column the extra key is skipped (Spark cannot sort maps) and
   * only the documented uniqueness contract protects determinism. Left
   * column names must not collide with the temporaries.
   *
   * Returned columns: every left column, then each `stateCols` column as
   * `asof_<name>`.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, stateCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    val tmp = Seq("_ts", "_prio", "_state", "_asof")
    require(!left.columns.exists(tmp.contains),
      s"left columns may not use reserved names ${tmp.mkString(", ")}")

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        struct(stateCols.map(col): _*).as("_state"),
        lit(0).as("_prio")): _*)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_prio", lit(1))
    // unionByName fills the side-specific columns (left payload on the
    // state side, _state on the event side) with nulls.
    val u = l.unionByName(r, allowMissingColumns = true)
    val stateType = org.apache.spark.sql.types.StructType(
      stateCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val stateOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(stateType)
    val orderKeys = Seq(col("_ts"), col("_prio")) ++
      (if (stateOrderable) Seq(col("_state")) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_state"), ignoreNulls = true).over(w))
      .filter(col("_prio") === 1)
      .select(left.columns.map(col).toSeq ++
        stateCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }

  /**
   * As-of LOOKUP against a SMALL reference dimension (FX rates, tax
   * tables, fee schedules — timelines keyed by a LOW-cardinality key):
   * the complement of [[asofJoin]], which interleaves facts and state
   * in one per-key window and is the right shape when the state table
   * scales with the facts. Here the whole dimension fits one executor,
   * so a per-key window over the FACTS would funnel everything through
   * |keys| tasks — a skew bottleneck no pushdown fixes. Instead the
   * dimension's per-key timeline folds to validity RANGES via lead()
   * (a window over the DIM only — coordinator-scale rows), and facts
   * pick their row through ONE broadcast hash join on the key with a
   * residual range predicate: map-only on the fact side, zero fact
   * shuffles at any scale. Facts before the key's first dim row get
   * nulls (left join), same as asofJoin's no-state-yet contract.
   *
   * Uniqueness contract (same as [[asofJoin]]'s): the dim must be
   * unique per (key, dimTs) — duplicate timestamps make "the" rate at
   * an instant ill-defined, lead() ordering ambiguous, and the left
   * join would fan facts out. A contract-violating input degrades to
   * a DETERMINISTIC pick mirroring asofJoin's pinned behavior: when
   * the payload struct is orderable, the MAX payload struct per
   * (key, dimTs) wins (a coordinator-scale pre-aggregate on the
   * already-small dim); a non-orderable payload (map-typed columns)
   * keeps the caller's rows and the caller owns uniqueness.
   */
  def asofLookup(facts: DataFrame, dim: DataFrame, key: String,
      factTs: String, dimTs: String, payload: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => dim.schema(dim.schema.fieldIndex(c))))
    val dim1 =
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(payloadType)) dim
      else dim.groupBy(col(key), col(dimTs))
        .agg(max(struct(payload.map(col): _*)).as("_p"))
        .select(Seq(col(key), col(dimTs)) ++
          payload.map(c => col("_p").getField(c).as(c)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(dimTs))
    val ranged = dim1.withColumn("_valid_to", lead(col(dimTs), 1).over(w))
    facts.join(broadcast(ranged),
      facts(key) === ranged(key) &&
        facts(factTs) >= ranged(dimTs) &&
        (ranged("_valid_to").isNull || facts(factTs) < ranged("_valid_to")),
      "left_outer")
      .select(facts.columns.toSeq.map(facts(_)) ++
        payload.map(c => ranged(c).as(s"asof_$c")): _*)
  }

  /**
   * NEAREST-event join — the bidirectional completion of [[asofJoin]]:
   * each `leftType` row pairs with the temporally NEAREST `rightType`
   * row of the same key, in EITHER direction (as-of only looks back;
   * sensor alignment, label attachment and gap diagnostics need both
   * sides). Union-window rewrite, never a pair join: one sort per key
   * by (ts, tiebreak); the latest right at-or-before each row is a
   * running MAX of the right rows' epoch-µs over the preceding frame
   * (the sort makes max = latest), the earliest right after is the MIN
   * over the following frame, and the nearer of the two wins (gap tie
   * → the earlier). ONE exchange + one sort feeds both frames — the j1
   * shape: cost tracks the event stream, the pair space never
   * materializes. Same-ts rows frame by (ts, tiebreak) ROW order, so
   * the neighbor set is deterministic in both engines. Gap arithmetic
   * is exact integer microseconds.
   */
  def nearestEventJoin(events: DataFrame, keyCol: String, tsCol: String,
      tiebreak: String, typeCol: String, leftType: String,
      rightType: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tiebreak).asc)
    val rightUs = when(col(typeCol) === rightType, col("__us"))
    val prevGap = col("__us") - col("__prev")
    val nextGap = col("__next") - col("__us")
    events
      .filter(col(typeCol).isin(leftType, rightType))
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev",
        max(rightUs).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__next",
        min(rightUs).over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(col(typeCol) === leftType)
      .withColumn("direction",
        when(col("__prev").isNull && col("__next").isNull, "none")
          .when(col("__next").isNull ||
            (col("__prev").isNotNull && prevGap <= nextGap), "prev")
          .otherwise("next"))
      .withColumn("nearest_us",
        when(col("direction") === "prev", col("__prev"))
          .when(col("direction") === "next", col("__next")))
      .withColumn("gap_us",
        when(col("direction") === "prev", prevGap)
          .when(col("direction") === "next", nextGap))
      .drop("__us", "__prev", "__next")
  }

  /**
   * Range (interval-containment) join: pair every left row with every
   * right interval `[start, end)` of the same key containing the left
   * timestamp (`start <= ts < end`).
   *
   * A naive `l.key = r.key AND l.ts >= r.start AND l.ts < r.end` plans
   * as a sort-merge join on the key alone with the range as a residual
   * filter — every (event, interval) pairing of a key materializes
   * before filtering, quadratic in the per-key row counts. This is
   * instead the time-bin bucketing form: both sides get a `_bin` =
   * floor(time / binSeconds) column — the point side its single bin,
   * the interval side one row per bin it OVERLAPS (a `sequence`
   * explode, ceil(len/bin)+1 rows per interval) — and the join becomes
   * a plain equi-join on (key, _bin) plus the exact containment filter.
   * Each qualifying pair meets in EXACTLY one bin (the event's), so no
   * dedup pass is needed. ONE shuffle on (key, _bin); candidate volume
   * is events-per-bin × intervals-overlapping-that-bin, controlled by
   * `binSeconds` (set it near the median interval length: shorter bins
   * amplify the interval side, longer bins widen the candidate window).
   *
   * Column names must be disjoint across the two sides apart from
   * `keys` (standard join hygiene); intervals with `end <= start` are
   * empty half-open ranges and match nothing.
   *
   * OPEN-INTERVAL HAZARD: the interval-side explode emits
   * ceil(len/bin)+1 rows per interval, so a sentinel end like
   * '9999-12-31' (SCD convention) with a small `binSeconds` would emit
   * millions of rows per interval — past Spark's sequence element limit
   * or an executor's memory. `maxBinsPerInterval` fails fast (a
   * per-interval `raise_error`, evaluated before any explode output is
   * buffered) instead of letting the job die mid-shuffle; raise the cap
   * deliberately, or cap sentinel ends to the data's real horizon first.
   */
  def rangeJoin(left: DataFrame, leftTs: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      keys: Seq[String], binSeconds: Long,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "column _bin is reserved")
    val binUs = binSeconds * 1000000L
    val l = left.withColumn("_bin", floor(unix_micros(col(leftTs)) / binUs))
    val startBin = floor(unix_micros(col(rightStart)) / binUs)
    // end is EXCLUSIVE: the last instant inside is end - 1us
    val endBin = floor((unix_micros(col(rightEnd)) - 1) / binUs)
    val r = right
      .filter(col(rightEnd) > col(rightStart))
      .withColumn("_bin", explode(
        when(endBin - startBin + 1 > maxBinsPerInterval, raise_error(concat(
          lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins of "),
          lit(s"$binSeconds s (start="), col(rightStart).cast("string"),
          lit(", end="), col(rightEnd).cast("string"),
          lit(s"); widen binSeconds, raise maxBinsPerInterval, or cap sentinel ends"))))
          .otherwise(sequence(startBin, endBin))))
    l.join(r, keys :+ "_bin")
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) < col(rightEnd))
      .drop("_bin")
  }

  /**
   * Gap-based sessionization via the built-in `session_window`: events of
   * one key belong to one session while each is within `gap` of the
   * previous — merge when `ts - prev <= gap` (an event landing EXACTLY on
   * the previous window's end still extends the session; windows
   * `[start, last+gap]` merge on touch, asserted in TemporalSpec), new
   * session strictly past the gap. Returns one row per session: key,
   * session bounds (`session_end` = last event + gap), event count, and
   * the decimal-exact sum of `valueCol`.
   *
   * `session_window` is the Spark-native form: ONE shuffle on the key
   * (the sort and the merge run inside the aggregate), and the identical
   * expression runs under Structured Streaming with a watermark — the
   * streaming twin is asserted equal to this batch plan in
   * StreamingSpec. A lag/cumsum window encoding would cost the same
   * shuffle but two extra window passes and has no streaming form.
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, valueCol: String): DataFrame =
    sessionizeRaw(events, keyCol, tsCol, gap, valueCol)
      .select(
        col(keyCol),
        col("session_start"),
        (col("last_ts") + expr(s"INTERVAL '$gap'")).as("session_end"),
        col("n_events"),
        col("v").cast("double").as("total_value"))

  /** [[sessionize]]'s MERGEABLE core (shared with the s25 streaming
    * fold — the twins-share-builders rule): one session_window
    * aggregate per (key, session), keeping the LAST EVENT TS
    * (session_end = last_ts + gap is session_window's own rule, so
    * nothing is lost) and the value sum as the EXACT decimal — the
    * carryable form a cross-trigger fold needs. The double cast
    * happens once at serve time, so a boundary-spanning session lands
    * on the batch answer bitwise. */
  def sessionizeRaw(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, valueCol: String): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).as("v"),
        max(col(tsCol)).as("last_ts"))
      .select(
        col(keyCol),
        col("sw.start").as("session_start"),
        col("last_ts"),
        col("n_events"),
        col("v"))

  /**
   * ORDERED-STEP FUNNEL — the product-analytics staple (Amplitude/
   * Mixpanel funnels; window-function gymnastics in a warehouse):
   * how many keys performed step 1, then step 2 strictly AFTER it,
   * then step 3 after that — per step, reach + conversion from the
   * previous step.
   *
   * ONE shuffle total: events group to a per-key ordered array (the
   * c4 sequences discipline — sort_array over (ts, tiebreak, type)
   * structs gives a deterministic order with ties broken by the id),
   * and the whole "each next step must come after the previous match"
   * semantics is a single left-to-right fold over that array (the
   * furthest step index only ever advances when the CURRENT event
   * matches the NEXT wanted step — positions later in the array are
   * by construction after the previous match). The alternative
   * relational form is one self-join per step — step-count joins of
   * the full event table; the fold does all steps in one pass and is
   * how the oracle's 3-join SQL is proven equivalent. Per-key arrays
   * are bounded by the same cap consideration as c4 (cap upstream for
   * degenerate hot keys).
   */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepsLit = typedLit(steps)
    val nSteps = steps.length
    val reached = events
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("ts"), col(tiebreakCol).as("tb"),
        col(typeCol).as("et")))).as("seq"))
      .select(col(keyCol), aggregate(col("seq"),
        struct(lit(0).as("k")),
        (acc, e) => struct(
          when(acc.getField("k") < nSteps &&
            e.getField("et") === element_at(stepsLit, acc.getField("k") + 1),
            acc.getField("k") + 1).otherwise(acc.getField("k")).as("k")))
        .getField("k").as("k"))
    funnelSummary(reached, steps)
  }

  /**
   * WINDOWED FUNNEL — [[funnel]] with a CONVERSION WINDOW: each step
   * must occur within `windowMicros` of the PREVIOUS matched step (the
   * "converted within 6 hours" semantics every funnel product ships).
   *
   * Greedy first-match is WRONG under a window: taking the earliest
   * step-2 event can doom a conversion a later step-2 event (still
   * within window of step 1) would have enabled. The fold is instead an
   * attainability DP over the per-key ordered array: `acc[i]` = the
   * LATEST event time that completes steps 1..i+1 under the window
   * constraints (null if unreachable). A later completion time strictly
   * dominates (it only relaxes the next step's window), so one
   * left-to-right pass is exact "exists a qualifying chain" — the
   * k-join EXISTS form the oracle runs. Every level reads the PREVIOUS
   * event's acc (`transform` captures the old array), so one event
   * never serves two adjacent steps; "after" ties on (ts, tiebreak)
   * exactly as [[funnel]].
   *
   * Same single-shuffle shape as [[funnel]]: one grouped sort_array +
   * one fold, nSteps longs of state per key.
   */
  def windowedFunnel(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, typeCol: String, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "windowedFunnel needs at least one step")
    require(windowMicros > 0, "windowMicros must be positive")
    val stepsLit = typedLit(steps)
    val nSteps = steps.length
    val init = array(Seq.fill(nSteps)(lit(null).cast("long")): _*)
    val reached = events
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("us"), col(tiebreakCol).as("tb"),
        col(typeCol).as("et")))).as("seq"))
      .select(col(keyCol), aggregate(col("seq"), init,
        (acc, e) => transform(acc, (f, i) => {
          val typeOk = e.getField("et") === element_at(stepsLit, i + 1)
          // element_at(acc, i) is 1-based = OLD acc of the previous
          // level; the i === 0 arm guards the out-of-range index away
          val prevOk = when(i === 0, lit(true))
            .otherwise(element_at(acc, i).isNotNull &&
              e.getField("us") <= element_at(acc, i) + lit(windowMicros))
          when(typeOk && prevOk, e.getField("us")).otherwise(f)
        })).as("acc"))
      .select(col(keyCol),
        size(filter(col("acc"), f => f.isNotNull)).as("k"))
    funnelSummary(reached, steps)
  }

  /** The funnel's reporting tail, factored out so the streaming twin
    * (EventStream.runningFunnel, s12) summarizes its per-key state with
    * the SAME code: per step, keys with `k` >= step + conversion from
    * the previous step. Expects a frame with an integer `k` column. */
  def funnelSummary(reached: DataFrame, steps: Seq[String]): DataFrame = {
    val nSteps = steps.length
    val aggs = (1 to nSteps).map(i =>
      sum(when(col("k") >= i, 1L).otherwise(0L)).as(s"n$i"))
    val counts = reached.agg(aggs.head, aggs.tail: _*)
    val rows = (1 to nSteps).map { i =>
      val prev = if (i == 1) col("n1") else col(s"n${i - 1}")
      struct(lit(i).as("step"), lit(steps(i - 1)).as("step_name"),
        col(s"n$i").as("n_users"), prev.as("prev"))
    }
    counts.select(explode(array(rows: _*)).as("s"))
      .select(col("s.step").as("step"), col("s.step_name").as("step_name"),
        col("s.n_users").as("n_users"),
        when(col("s.prev") > 0,
          col("s.n_users").cast("double") / col("s.prev").cast("double"))
          .as("conv_from_prev"))
  }

  /**
   * SLIDING-WINDOW DISTINCT COUNT — rolling 7/28-day active users
   * (DAU/WAU/MAU), the metric every event warehouse reports daily.
   *
   * The relational form is a range join: active-days × per-day actives
   * on `u.day BETWEEN d.day - (w-1) AND d.day` — a theta join whose
   * comparison count is |days| x |user-days| (no equi key, so Spark
   * plans it as a broadcast nested loop; at 100 TB of events that scan
   * repeats per reported day). This is instead the BOUNDED-EXPLODE
   * rewrite, linear end to end:
   *
   *   1. distinct (user, day) FIRST — collapses raw event volume (the
   *      100-TB side) to at most |users| x |days| rows BEFORE any
   *      amplification; map-side partial aggregation does the heavy
   *      collapse pre-shuffle. Exploding before this distinct would
   *      amplify the raw event stream w times — order is the whole
   *      operator.
   *   2. each (user, day) contributes to the w report days
   *      [day, day+w-1]: a narrow `explode(sequence(...))` — exactly w
   *      rows per user-day, no skew possible (amplification is a
   *      constant, not data-dependent).
   *   3. one `count(DISTINCT user)` per report day — Spark plans the
   *      distinct as a two-phase aggregate keyed (report_day, user),
   *      deduping the same user arriving from several active days
   *      inside one window.
   *   4. semi-join back to the observed-day set, so partial windows
   *      past the data's horizon are not reported; the day dimension is
   *      |calendar days| — broadcast by construction.
   *
   * For windows too wide for a w-times explode (365-day rolling), the
   * same day-grain pre-aggregate feeds the sketch path instead: per-day
   * HLL sketches (r5's machinery) merged w-per-window — constant
   * amplification, approximate counts; this operator is the exact form.
   *
   * Returns (day, n_users): for each day with at least one event, the
   * distinct users active in the trailing `windowDays` window.
   */
  def slidingDistinct(events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val userDays = events
      .select(col(keyCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .distinct()
    val observed = userDays.select(col("_d").as("day")).distinct()
    userDays
      .select(col("_u"), explode(
        sequence(col("_d"), date_add(col("_d"), windowDays - 1))).as("day"))
      .join(broadcast(observed), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("_u")).as("n_users"))
  }

  /**
   * The SKETCH path of [[slidingDistinct]] — for windows too wide for a
   * w-times explode of user-days (365-day rolling actives), the same
   * day-grain pre-aggregate feeds per-day HLL sketches instead: ONE
   * sketch row per (day) regardless of user count, and each report
   * day's estimate is a union fold over its w sketch rows. The explode
   * here amplifies |days| SKETCH rows by w — metadata-sized — where
   * [[slidingDistinct]] amplifies |users|·|days| rows; beyond the
   * build's single event scan, serving touches zero fact I/O (the
   * r5/r8 store economics applied to the rolling window). Estimates
   * carry the HLL 1.04/√2^lgK relative-error guarantee; the a11
   * catalog entry gates this path against the exact rewrite at 5%.
   */
  def slidingDistinctSketch(events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int, lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val daily = events
      .select(col(keyCol).as("_u"), to_date(col(tsCol)).as("_d"))
      .groupBy(col("_d"))
      .agg(hll_sketch_agg(col("_u"), lit(lgK)).as("sk"))
    val observed = daily.select(col("_d").as("day"))
    daily
      .select(col("sk"), explode(
        sequence(col("_d"), date_add(col("_d"), windowDays - 1))).as("day"))
      .join(broadcast(observed), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
  }

  /**
   * INTERVAL OVERLAP JOIN — all pairs of intervals (one from each side,
   * same key) whose half-open ranges [start, end) intersect: the
   * "which sessions overlapped which campaigns / incidents / shifts"
   * question. [[rangeJoin]] is its point-in-interval special case.
   *
   * Spark plans a raw `ls < re AND rs < le` predicate as a broadcast
   * nested loop (no equi key) — quadratic per key. Both sides here
   * explode to the time bins their interval covers, join on
   * (keys, bin) — an EQUI join, one hash shuffle per side — and keep
   * true overlaps. A pair overlapping across several shared bins would
   * emit once per bin; instead of a distinct (a second shuffle over the
   * whole result), each pair is emitted ONLY at its OWNING bin — the
   * bin containing the intersection's start, `greatest(ls, rs)` —
   * which exactly one joined bin row satisfies. Dedup is a codegen'd
   * filter, not a shuffle.
   *
   * `binSeconds` tunes the amplification-vs-candidates tradeoff as in
   * [[rangeJoin]] (set near the median interval length), and the same
   * open-interval hazard applies to BOTH sides here: a sentinel end
   * explodes ceil(len/bin) rows, so `maxBinsPerInterval` fail-fasts
   * per interval before any explode output is buffered.
   *
   * Column names must be disjoint across the two sides apart from
   * `keys`; empty intervals (end <= start) match nothing.
   */
  def overlapJoin(left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      keys: Seq[String], binSeconds: Long,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "column _bin is reserved")
    val binUs = binSeconds * 1000000L
    def bins(start: String, end: String): Column = {
      val startBin = floor(unix_micros(col(start)) / binUs)
      val endBin = floor((unix_micros(col(end)) - 1) / binUs)
      explode(
        when(endBin - startBin + 1 > maxBinsPerInterval, raise_error(concat(
          lit(s"overlapJoin: interval spans more than $maxBinsPerInterval bins of "),
          lit(s"$binSeconds s (start="), col(start).cast("string"),
          lit(", end="), col(end).cast("string"),
          lit(s"); widen binSeconds, raise maxBinsPerInterval, or cap sentinel ends"))))
          .otherwise(sequence(startBin, endBin)))
    }
    val l = left.filter(col(leftEnd) > col(leftStart))
      .withColumn("_bin", bins(leftStart, leftEnd))
    val r = right.filter(col(rightEnd) > col(rightStart))
      .withColumn("_bin", bins(rightStart, rightEnd))
    l.join(r, keys :+ "_bin")
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("_bin") ===
        floor(unix_micros(greatest(col(leftStart), col(rightStart))) / binUs))
      .drop("_bin")
  }

  /**
   * MULTI-TOUCH ATTRIBUTION — the journey-credit operator every
   * conversion-funnel mart ends with (first-touch / last-touch / linear,
   * the three models every attribution tool ships): each touch event is
   * assigned to the NEXT conversion of the same user within `lookback`,
   * and every (conversion, touch) pair carries its rank in the journey,
   * the journey size, both positional flags, and a scaled-long linear
   * credit floor(`creditScale` / n_touches) — position-weighted models
   * (U-shaped, time-decay) are one expression over (touch_rank,
   * n_touches) downstream.
   *
   * The touch→conversion assignment is the FORWARD as-of join, by the
   * same union-merge discipline as [[asofJoin]] (an inequality join
   * would pair every touch with every later conversion before an argmin
   * prunes — quadratic per user): one window over (user) ordered by
   * (ts, event_id) DESCENDING carries the nearest following conversion
   * back onto every touch. The (ts, event_id) lexicographic order makes
   * simultaneous-timestamp ties deterministic in both engines; a touch
   * dated exactly at a conversion attributes to it only when its
   * event_id is smaller. Touches with no conversion inside `lookback`
   * and conversions with no touches produce no rows (no credit to
   * assign).
   *
   * Arithmetic is engine-exact: ranks/counts are integers, the interval
   * test compares native timestamps, and the linear credit is one floor
   * over exact-in-double operands (creditScale <= 2^53).
   *
   * Scale shape: two exchanges end to end — hash(user) for the
   * assignment window, hash(user, conversion) for the per-journey
   * rank/count pair (both windows on the second key share one
   * exchange). Everything is windows over the filtered event set; no
   * join at all.
   */
  def multiTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, touchTypes: Seq[String],
      convType: String, lookback: String,
      creditScale: Long = 1000000L): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touch types must be nonempty and exclude the conversion type")
    require(creditScale > 0 && creditScale <= (1L << 53),
      "creditScale must stay exact in double")
    val ev = events
      .select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        col(idCol).as("event_id"), col(typeCol).as("touch_type"))
      .filter(col("touch_type").isin((touchTypes :+ convType).map(x => x: Any): _*))
      .withColumn("_conv", col("touch_type") === convType)
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = ev
      .withColumn("conv_id", last(when(col("_conv"), col("event_id")),
        ignoreNulls = true).over(wDesc))
      .withColumn("conv_ts", last(when(col("_conv"), col("ts")),
        ignoreNulls = true).over(wDesc))
      .filter(!col("_conv") && col("conv_id").isNotNull &&
        col("conv_ts") <= col("ts") + expr(s"INTERVAL $lookback"))
    val wConv = Window.partitionBy("user_id", "conv_id")
    assigned
      .withColumn("touch_rank",
        row_number().over(wConv.orderBy(col("ts"), col("event_id"))))
      .withColumn("n_touches", count(lit(1)).over(wConv))
      .select(col("user_id"), col("conv_id"),
        col("event_id").as("touch_id"), col("touch_type"),
        col("touch_rank"), col("n_touches"),
        (col("touch_rank") === 1).as("first_touch"),
        (col("touch_rank") === col("n_touches")).as("last_touch"),
        floor(lit(creditScale.toDouble) / col("n_touches")).as("linear_credit"))
  }

  /**
   * GROWTH ACCOUNTING (the new/retained/resurrected/churned user ledger
   * — the standard DAU decomposition every product-analytics stack
   * serves): per active day, users split by their PREVIOUS active day —
   * `new` (none), `retained` (yesterday), `resurrected` (older) — and
   * `churned(d)` counts users active on d−1 but not d, derived WITHOUT
   * a self-join as active(d−1) − retained(d) (retained(d) is exactly
   * the d∩d−1 overlap). Identity gates the ledger internally:
   * n_active = n_new + n_retained + n_resurrected on every row, and
   * net_growth = n_new + n_resurrected − n_churned is the day-over-day
   * active delta wherever days are adjacent. Churn on a day with NO
   * activity at all is not reported (no row to hang it on — a13's
   * gap-fill grid is the completion for that).
   *
   * Scale shape: one distinct over (user, day), one per-user lag window
   * (partitioned — corpus-parallel), one day-level aggregate; the final
   * unpartitioned lag runs over DAY-cardinality rows (the r7 histogram
   * discipline: global windows only over sketch-sized data).
   */
  def growthAccounting(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val acts = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val perUser = Window.partitionBy("user_id").orderBy("day")
    val lagged = acts.withColumn("pday", lag(col("day"), 1).over(perUser))
    val daily = lagged.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("pday").isNull, 1)).as("n_new"),
        count(when(datediff(col("day"), col("pday")) === 1, 1)).as("n_retained"),
        count(when(datediff(col("day"), col("pday")) > 1, 1)).as("n_resurrected"))
    growthLedgerFinish(daily)
  }

  /** The churn/net finish over a per-day transition table (day DATE,
    * n_active, n_new, n_retained, n_resurrected) — shared by the batch
    * ledger and the streaming fold's serve step (the twins-share-
    * builders rule). The unpartitioned day-lag is legal ONLY because
    * the input is day-cardinality. */
  def growthLedgerFinish(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.orderBy("day")
    daily
      .withColumn("n_churned",
        when(datediff(col("day"), lag(col("day"), 1).over(byDay)) === 1,
          lag(col("n_active"), 1).over(byDay) - col("n_retained"))
          .otherwise(lit(0L)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        (col("n_new") + col("n_resurrected") - col("n_churned"))
          .as("net_growth"))
  }
}
