package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality constraint checks — the engine-side analog of the dbt
 * schema tests the reference runs on every build (reference:
 * dbt/job_dbt/models/marts/schema.yml:10-25 — `unique` / `not_null` on
 * `job_uid`, `accepted_values` on enum columns). A daily pipeline without
 * these ships silent corruption; here they are one declarative operator
 * returning a violations summary a scheduler can gate on.
 *
 * Semantics follow dbt's tests:
 *  - `unique`: number of DISTINCT non-null key values occurring more than
 *    once (dbt's `GROUP BY col HAVING count(*) > 1` row count; nulls are
 *    the `not_null` test's job);
 *  - `not_null`: number of rows where the column is null;
 *  - `accepted_values`: number of rows whose NON-NULL value is outside the
 *    allowed domain (as in dbt, nulls pass — they are flagged by
 *    `not_null` when both tests are declared);
 *  - `relationships`: number of rows whose NON-NULL foreign-key value has
 *    no match in the parent table (dbt's referential-integrity test,
 *    schema.yml:81 — fct_jobs.company_id → dim_companies).
 *
 * Scale shape: all `not_null` + `accepted_values` checks fold into ONE
 * full-scan aggregation (conditional counts — map-side combinable, zero
 * extra shuffle beyond the single-row reduce); each `unique` check is one
 * groupBy on its key (partial-agg'd count per key, then a single-row
 * reduce of the >1 groups); each `relationships` check is one left-anti
 * join of the fact against the parent's DISTINCT keys — Catalyst
 * broadcasts the (deduplicated, single-column) key set when the parent is
 * a dim, and falls back to a shuffled hash join keyed on the FK when it
 * is not. Nothing is collected to the driver; the result is a tiny
 * DataFrame of (check_name, column_name, n_violations).
 */
object Checks {

  /**
   * Violation summary for the declared constraints: one row per
   * (check_name, column_name) with its violation count — 0 everywhere
   * means the table passes.
   */
  def violations(df: DataFrame, unique: Seq[String], notNull: Seq[String],
      acceptedValues: Seq[(String, Seq[String])],
      relationships: Seq[(String, DataFrame, String)] = Seq.empty): DataFrame = {
    require(unique.nonEmpty || notNull.nonEmpty || acceptedValues.nonEmpty ||
      relationships.nonEmpty, "at least one constraint must be declared")
    val rowLevel: Seq[DataFrame] =
      if (notNull.isEmpty && acceptedValues.isEmpty) Seq.empty
      else {
        val aggs =
          notNull.map(c => count(when(col(c).isNull, lit(1))).as(s"nn_$c")) ++
            acceptedValues.map { case (c, vals) =>
              count(when(col(c).isNotNull && !col(c).isin(vals.map(lit): _*), lit(1)))
                .as(s"av_$c")
            }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows =
          notNull.map(c => struct(lit("not_null").as("check_name"),
            lit(c).as("column_name"), col(s"nn_$c").as("n_violations"))) ++
            acceptedValues.map { case (c, _) => struct(lit("accepted_values").as("check_name"),
              lit(c).as("column_name"), col(s"av_$c").as("n_violations"))
            }
        Seq(one.select(explode(array(rows: _*)).as("v")).select("v.*"))
      }
    val uniques = unique.map { c =>
      df.filter(col(c).isNotNull)
        .groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
        .agg(count(when(col("cnt") > 1, lit(1))).as("n_violations"))
        .select(lit("unique").as("check_name"), lit(c).as("column_name"),
          col("n_violations"))
    }
    val rels = relationships.map { case (c, parent, pc) =>
      df.filter(col(c).isNotNull)
        .join(parent.select(col(pc).as("__parent_key")).distinct(),
          col(c) === col("__parent_key"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("relationships").as("check_name"), lit(c).as("column_name"),
          col("n_violations"))
    }
    (rowLevel ++ uniques ++ rels).reduce(_.unionAll(_))
  }

  /**
   * Distribution drift between two halves of one table — the monitoring
   * step a daily pipeline runs BEFORE publishing (is today's data shaped
   * like yesterday's?), the natural next check after [[violations]]'
   * schema tests: constraints catch broken rows, drift catches a broken
   * upstream whose rows are individually valid.
   *
   * `valueCol` is histogrammed into fixed-width bins
   * (`floor(value / binWidth)`); rows matching `isB` form window B, the
   * rest window A. Per `groupCol` value the output reports both window
   * populations and the TOTAL VARIATION DISTANCE between the two binned
   * distributions — `0.5 * Σ_bins |cA/nA − cB/nB|`, 0 for identical
   * shapes, 1 for disjoint support — plus the single most-drifted bin
   * (ties to the lower bin id). A group empty on either side is maximal
   * drift by definition (tvd = 1.0).
   *
   * Cross-engine determinism (SURVEY.md §6): the per-bin deviation is
   * kept in EXACT integer form `|cA·nB − cB·nA|` (counts and their
   * products are exact BIGINTs; Σ over bins ≤ 2·nA·nB stays far below
   * 2^53) and only the final normalization performs float math — one
   * multiply chain and one division on exactly-representable operands,
   * IEEE-identical in any engine.
   *
   * Scale shape: one scan with map-side partial counts into
   * (group, bin) cells — the shuffle carries groups·bins rows, not the
   * table; the per-group totals/argmax windows and the final reduce all
   * run on that contracted relation, and the final groupBy reuses the
   * windows' hash(group) partitioning (exactly two exchanges end to end,
   * both post-contraction).
   */
  def distributionDrift(df: DataFrame, groupCol: String, valueCol: String,
      isB: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val cells = df
      .withColumn("_bin", floor(col(valueCol) / binWidth).cast("long"))
      .withColumn("_b", isB)
      .groupBy(col(groupCol), col("_bin"))
      .agg(count(when(!col("_b"), lit(1))).as("_ca"),
        count(when(col("_b"), lit(1))).as("_cb"))
    driftFromCells(cells, groupCol)
  }

  /** One side's histogram: (`groupCol`, `_bin`, `countName`) cells with
    * fixed-width value bins — the contracted relation both
    * [[distributionDrift]] (fused, both sides in one scan) and its
    * streaming twin (window A frozen once, window B folded per trigger)
    * reduce to before [[driftFromCells]]. */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double, countName: String): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.withColumn("_bin", floor(col(valueCol) / binWidth).cast("long"))
      .groupBy(col(groupCol), col("_bin"))
      .agg(count(lit(1)).as(countName))
  }

  /**
   * Row-level RECONCILIATION between two versions of a keyed table — the
   * audit every publish step should run before a swap ("what did this
   * release change"): row counts added / removed / changed / unchanged
   * plus a per-column changed count, as one (section, item, n) summary a
   * scheduler can gate on (the shape dbt's `dbt-audit-helper` and every
   * data-diff tool reports; reference analog: the run-report counts in
   * services/notifier/email.py:100 compare stages, this compares
   * VERSIONS).
   *
   * Semantics: keys are matched with a full-outer join; a row counts as
   * `changed` when both versions have the key and ANY compared column
   * differs under NULL-SAFE equality (NULL→value and value→NULL are
   * changes; NULL→NULL is not), and each differing column increments its
   * own `column` row independently (one changed row can tick several
   * columns).
   *
   * Scale shape: ONE full-outer shuffle join on the key (co-located and
   * shuffle-free when both versions are published bucketed on the key —
   * the w3 layout discipline) feeding ONE single-row conditional
   * aggregate (map-side combinable); the (section, item, n) rows are
   * inlined from that one row, so nothing but the join ever touches the
   * data. No column comparison is a separate pass — a version diff over
   * N columns costs exactly one join regardless of N.
   */
  def diffReport(oldDf: DataFrame, newDf: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one compared column")
    val o = oldDf.select((key +: cols).map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select((key +: cols).map(c => col(c).as(s"n_$c")): _*)
    val j = o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
    val both = col(s"o_$key").isNotNull && col(s"n_$key").isNotNull
    def colChanged(c: String): Column = !(col(s"o_$c") <=> col(s"n_$c"))
    val anyChanged = cols.map(colChanged).reduce(_ || _)
    val aggs = Seq(
      count(when(col(s"o_$key").isNull, 1)).as("added"),
      count(when(col(s"n_$key").isNull, 1)).as("removed"),
      count(when(both && anyChanged, 1)).as("changed"),
      count(when(both && !anyChanged, 1)).as("unchanged")) ++
      cols.map(c => count(when(both && colChanged(c), 1)).as(s"col_$c"))
    val one = j.agg(aggs.head, aggs.tail: _*)
    val rows =
      Seq("added", "removed", "changed", "unchanged").map(i =>
        struct(lit("rows").as("section"), lit(i).as("item"), col(i).as("n"))) ++
        cols.map(c =>
          struct(lit("column").as("section"), lit(c).as("item"),
            col(s"col_$c").as("n")))
    one.select(inline(array(rows: _*)))
  }

  /** TVD + most-drifted bin from pre-binned cells
    * (`groupCol`, `_bin`, `_ca`, `_cb`) — [[distributionDrift]]'s math,
    * factored so any cell provenance (one fused scan, or two histograms
    * outer-joined across a batch/stream seam) scores identically. */
  def driftFromCells(cells: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val dev = cells
      .withColumn("_na", sum(col("_ca")).over(byGroup))
      .withColumn("_nb", sum(col("_cb")).over(byGroup))
      .withColumn("_dev", abs(col("_ca") * col("_nb") - col("_cb") * col("_na")))
      .withColumn("_rn", row_number().over(
        byGroup.orderBy(col("_dev").desc, col("_bin"))))
    dev.groupBy(col(groupCol))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        sum(col("_dev")).as("_sumdev"),
        min(when(col("_rn") === 1, col("_bin"))).as("top_bin"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(1.0))
          .otherwise(col("_sumdev").cast("double") /
            (lit(2.0) * col("n_a") * col("n_b"))).as("tvd"),
        col("top_bin"))
  }

  /**
   * VOLUME-SLA ANOMALY FLAGS — the feed-monitoring check every
   * warehouse's source-freshness/volume monitor runs (dbt source
   * freshness, Monte-Carlo-style volume rules): per (group, day) row
   * counts judged against the trailing `lookback`-day mean, flagging
   * days whose count deviates by more than `pctThreshold` percent —
   * the shape that catches a silent upstream outage (half a day's
   * events missing) or a runaway duplicator before a human does.
   *
   * The deviation test is ALL-INTEGER: |n·k − Σprev|·100 >
   * pct·Σprev (k = trailing days present, Σprev their count sum) —
   * algebraically "count differs from the trailing mean by > pct%"
   * without ever forming the mean, so there is no float division, no
   * stddev, no summation-order sensitivity: the verdict is
   * bit-identical in any engine. Warm-up days (fewer than 3 trailing
   * days) are unjudged, not silently "normal".
   *
   * One daily count aggregate (map-side partials — the only data-sized
   * pass) + one rows-window over the day series per group
   * (metadata-sized: days × groups). At 100 TB the daily counts are
   * exactly the partition-level row counts a manifest already carries
   * (w17), so the production form reads NO data at all.
   */
  def volumeAnomaly(df: DataFrame, groupCol: String, tsCol: String,
      lookback: Int, pctThreshold: Int): DataFrame =
    volumeAnomalyFromDaily(dailyCounts(df, groupCol, tsCol), groupCol,
      lookback, pctThreshold)

  /** The per-(group, day) count table [[volumeAnomaly]] judges — split
    * out so s27's streaming fold can maintain THE SAME table
    * incrementally (counts are associative: any trigger slicing sums
    * to the batch counts) and serve through the same verdict below
    * (the s7/s21 shared-builder twin rule). */
  def dailyCounts(df: DataFrame, groupCol: String, tsCol: String): DataFrame =
    df.groupBy(col(groupCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))

  /** The trailing-window all-integer verdict over a daily-count table —
    * [[volumeAnomaly]]'s finish, shared verbatim by the batch monitor
    * (q5) and the streaming fold's serve (s27). Metadata-sized: the
    * window rides days × groups rows, never the events. */
  def volumeAnomalyFromDaily(daily: DataFrame, groupCol: String,
      lookback: Int, pctThreshold: Int): DataFrame = {
    require(lookback >= 3 && pctThreshold > 0,
      "need >= 3 trailing days and a positive threshold")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("prev_days", count(lit(1)).over(w))
      .withColumn("__prev_sum", sum(col("n_events")).over(w))
      .filter(col("prev_days") >= 3)
      .select(col(groupCol), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("prev_days"),
        (abs(col("n_events") * col("prev_days") - col("__prev_sum")) * 100 >
          lit(pctThreshold) * col("__prev_sum")).as("is_anomaly"))
  }

  /**
   * EMBEDDING-SPACE DRIFT — the vector-column leg of the q-family: q3
   * watches a SCALAR value distribution; this watches the embedding
   * distribution itself, per dimension, between a reference slice and a
   * current slice (yesterday's corpus vs today's, pre- vs post-encoder
   * upgrade). A quietly swapped or fine-tuned encoder shifts the
   * embedding centroid long before any downstream metric moves — ANN
   * recall (q6) degrades only after the index is stale; THIS check fires
   * on the day the vectors change. Emits one row per dimension:
   * (dim, n_ref, n_cur, ref_mean, cur_mean, shift, is_drift).
   *
   * Cross-engine determinism (SURVEY.md §6): per-dimension means fold
   * through exact DECIMAL(30,20) sums (float→double is exact; decimal
   * addition is exact), divide by the exact count ONCE, and round to
   * 6 dp — the [[graft.operators.Ann.refineCentroids]] mean contract —
   * so the means, their difference, and the threshold verdict are
   * bit-identical in any engine. A dimension with an EMPTY side is
   * drift by definition (is_drift = true, means NULL on that side) —
   * the [[distributionDrift]] tvd = 1.0 convention.
   *
   * Scale shape: ONE fused scan — both slices ride the same pass with a
   * conditional-sum per side (the q3 discipline), posexplode is a
   * narrow Generate, and map-side partial aggregation contracts the
   * shuffle to partitions×dim rows before the exchange; the output is
   * dim rows, coordinator-sized for any real embedding width. No join,
   * no window, exactly one exchange end to end.
   */
  def embeddingDrift(df: DataFrame, isCur: Column, embCol: String,
      threshold: Double): DataFrame = {
    val cells = df
      .select(isCur.as("_c"), posexplode(col(embCol)).as(Seq("dim", "_x")))
      .withColumn("_xd", col("_x").cast("double").cast("decimal(30,20)"))
      .groupBy(col("dim"))
      .agg(sum(when(!col("_c"), col("_xd"))).as("_sr"),
        count(when(!col("_c"), lit(1))).as("n_ref"),
        sum(when(col("_c"), col("_xd"))).as("_sc"),
        count(when(col("_c"), lit(1))).as("n_cur"))
    embeddingDriftFromCells(cells, threshold)
  }

  /**
   * K-ANONYMITY + L-DIVERSITY AUDIT — the privacy gate a published
   * dataset needs beside PII redaction (t5 removes direct identifiers;
   * THIS catches re-identification by quasi-identifier combination —
   * Sweeney's k-anonymity, and Machanavajjhala's l-diversity for the
   * homogeneity attack k-anonymity alone misses: a group of 7 rows is
   * k=5-safe yet leaks everything if all 7 share the sensitive value).
   * One row per quasi-identifier equivalence class: its size, the
   * number of DISTINCT sensitive values inside it, and the two risk
   * flags (size < k → re-identifiable; diversity < l → attribute
   * disclosure). Publication gates consume `anyRisk`; the per-class
   * rows are the suppression work-list.
   *
   * All-integer verdicts (counts and comparisons only — no float
   * enters), so any engine replays them bit for bit.
   *
   * Scale shape: ONE aggregation over the quasi columns; the exact
   * distinct-count plans as Spark's two-phase Expand aggregate — both
   * phases map-side partial, one exchange on the quasi key, output
   * sized to equivalence classes (the contracted relation), never rows.
   */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2 && l >= 1,
      "need quasi-identifier columns, k >= 2, l >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(
        col("n_rows"), col("n_sensitive"),
        (col("n_rows") < k).as("k_risk"),
        (col("n_sensitive") < l).as("l_risk")): _*)
  }

  /** One side's per-dimension partial cells: (`dim`, `sumName` = exact
    * DECIMAL(38,20) value sum, `cntName` = row count) — the contracted
    * relation the streaming twin freezes (reference side) and folds per
    * trigger (current side). Decimal sums and counts are associative and
    * EXACT, so any trigger slicing folds to the one-shot cells bit for
    * bit — the property that lets [[embeddingDriftFromCells]] score a
    * batch/stream seam identically to the fused scan. */
  def embeddingCells(df: DataFrame, embCol: String, sumName: String,
      cntName: String): DataFrame =
    df.select(posexplode(col(embCol)).as(Seq("dim", "_x")))
      .groupBy(col("dim"))
      .agg(sum(col("_x").cast("double").cast("decimal(30,20)")).as(sumName),
        count(lit(1)).as(cntName))

  /** Verdict from pre-aggregated cells (`dim`, `_sr`, `n_ref`, `_sc`,
    * `n_cur`) — [[embeddingDrift]]'s math, factored so any cell
    * provenance (one fused scan, or a frozen reference joined with a
    * per-trigger folded state) scores identically: divide the exact sum
    * by the exact count ONCE, round to 6 dp, difference + threshold on
    * the rounded doubles. */
  def embeddingDriftFromCells(cells: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    cells
      .select(col("dim"), col("n_ref"), col("n_cur"),
        round(col("_sr").cast("double") / col("n_ref"), 6).as("ref_mean"),
        round(col("_sc").cast("double") / col("n_cur"), 6).as("cur_mean"))
      .withColumn("shift", abs(col("cur_mean") - col("ref_mean")))
      .withColumn("is_drift",
        when(col("n_ref") === 0 || col("n_cur") === 0, lit(true))
          .otherwise(col("shift") > threshold))
  }
}
