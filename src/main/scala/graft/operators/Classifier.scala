package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality curation (the DCLM/FineWeb-class filter a
 * training-data pipeline puts ABOVE handcrafted heuristics): a linear
 * classifier is TRAINED on a labeled slice of the corpus and then
 * scores every document map-only. The reference has only static rule
 * scoring (services/ranker/scoring.py:10 calculate_rank — fixed
 * weights over handcrafted signals); this is the learned tier over the
 * same signal family.
 *
 * Everything is EXACT fixed-point integer arithmetic so a second
 * engine can replay training bit-for-bit (the Lloyd/BPE coordinator
 * discipline: per-round driver state = ONE weight row, per-round
 * distributed work = ONE full-batch aggregate over the labeled slice):
 *  - features are the t2 quality components scaled to integers in
 *    [0, 1000] (floored ratios — ties broken identically everywhere);
 *  - training is full-batch perceptron: err_i = y_i − [w·x_i > 0],
 *    grad = Σ err_i·x_i (an associative integer SUM — map-side
 *    partial-aggregated, exact under any partitioning), w += grad;
 *  - scoring is one codegen'd projection, zero shuffles.
 *
 * At 100 TB: the labeled slice is the only training input (per round
 * one aggregate over it — shuffle carries 5 longs per partition), and
 * scoring is embarrassingly parallel. The driver holds 5 longs of
 * state; nothing is collected but the per-round gradient row.
 */
object Classifier {

  /** The feature column names [[qualityFeatures]] emits (bias first). */
  val featCols: Seq[String] = Seq("x0", "x1", "x2", "x3", "x4")

  /**
   * Scaled-integer quality features over the normalized text — the t2
   * formula's components, fixed-point: x0 = 1000 (bias), x1 = length
   * score ·1000 (= min(len,500)·2, exact), x2 = distinct-word ratio
   * ·1000 floored, x3 = (1 − punct ratio)·1000 floored, x4 = stopword
   * ratio ·1000 floored. Empty-normalized docs are excluded (their
   * ratios are 0/0). One codegen'd projection, no shuffle.
   */
  def qualityFeatures(docs: DataFrame, stops: Seq[String]): DataFrame = {
    val t = graft.functions.text.normKey(col("text"))
    docs.select(col("doc_id"), t.as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"),
        length(col("t")).cast("long").as("lt"),
        split(col("t"), " ").as("ws"),
        (length(col("t")) -
          length(regexp_replace(col("t"), "[a-z0-9 ]", "")))
          .cast("long").as("np"))
      .select(col("doc_id"), col("lt"), col("np"),
        size(col("ws")).cast("long").as("nw"),
        size(array_distinct(col("ws"))).cast("long").as("nd"),
        size(filter(col("ws"), w => w.isin(stops.map(lit): _*)))
          .cast("long").as("ns"))
      .select(col("doc_id"),
        lit(1000L).as("x0"),
        (least(col("lt"), lit(500L)) * 2).as("x1"),
        expr("1000 * nd div nw").as("x2"),
        (lit(1000L) - expr("1000 * np div lt")).as("x3"),
        expr("1000 * ns div nw").as("x4"))
  }

  /** The fixed-point linear score Σ wⱼ·xⱼ for a given weight row. */
  def linearScore(cols: Seq[String], w: Seq[Long]): Column =
    cols.zip(w).map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)

  /**
   * Full-batch perceptron training with a DECAYING integer step, exact
   * arithmetic throughout: `rounds` passes, each ONE aggregate over the
   * labeled frame (sum of err·x per feature); the driver folds the
   * 5-long gradient row into the weights as `w += grad >> round`.
   *
   * Why the shift: a unit-step full-batch perceptron on separable data
   * OSCILLATES in a 2-cycle (round 1 overshoots positive — every doc
   * predicted 1 — round 2's gradient slams it negative, and so on;
   * measured on the corpus features: accuracy stuck at the majority
   * class, admit rate 0). Halving the step each round damps the cycle
   * exactly like a 1/2^r learning rate, and the arithmetic SHIFT keeps
   * it replayable: `>>` is floor division by 2^r in two's complement —
   * Scala Long `>>` and DuckDB BIGINT `>>` agree on negatives (both
   * floor; DuckDB's `//` does NOT — it truncates — which is why the
   * oracle uses the shift too). Measured held-out accuracy 0.85-0.94
   * across SFs vs 0.54 for the unit step.
   *
   * Deterministic under any partitioning (integer sums are associative
   * and commutative — no float order sensitivity), so a replaying
   * engine lands on the same weights bit for bit.
   */
  def trainPerceptron(labeled: DataFrame, cols: Seq[String],
      labelCol: String, rounds: Int): Array[Long] = {
    val w = Array.fill(cols.size)(0L)
    for (r <- 0 until rounds) {
      val err = col(labelCol) -
        when(linearScore(cols, w.toSeq) > 0, 1L).otherwise(0L)
      val gradAggs = cols.map(c => sum(err * col(c)).as(s"g_$c"))
      val g = labeled.agg(gradAggs.head, gradAggs.tail: _*).head()
      cols.indices.foreach(j => if (!g.isNullAt(j)) w(j) += (g.getLong(j) >> r))
    }
    w
  }

  /** Map-only scoring: (doc_id, score, admit = [score > 0]). */
  def score(feats: DataFrame, cols: Seq[String], w: Seq[Long]): DataFrame = {
    val s = linearScore(cols, w)
    feats.select(col("doc_id"), s.as("score"),
      when(s > 0, 1).otherwise(0).cast("int").as("admit"))
  }
}
