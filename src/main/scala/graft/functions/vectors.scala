package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector Column functions (embeddings.parquet: Array[Float]).
 *
 * All reductions fold element products through DECIMAL(38,20) instead of
 * summing doubles: decimal addition is exact and therefore independent of
 * fold/partition order, so the same cosine comes out of any engine at any
 * parallelism — which is what makes these usable both for the DuckDB
 * correctness oracle and for deterministic re-runs on a 1000-executor
 * cluster. The per-element double products themselves are IEEE-identical
 * everywhere. Everything is a higher-order Column function: codegen'd,
 * zero shuffle, no UDF.
 */
object vectors {

  // DECIMAL(30,20) leaves headroom below Spark's precision cap of 38: the
  // (acc + p) result is DECIMAL(31,20) and the cast back to (30,20) only
  // trims unused integer digits — scale stays 20, so the fold is EXACT.
  // (At (38,20) Spark would trim the scale to 19 and round every step.)
  private val Dec = "decimal(30,20)"

  /** Exact dot product of two float/double array columns (as double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec),
      (acc, p) => (acc + p).cast(Dec)).cast("double")

  /** Exact squared L2 norm (as double). */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(Dec)),
      lit(0).cast(Dec),
      (acc, p) => (acc + p).cast(Dec)).cast("double")

  /**
   * Cosine similarity, 0.0 when either vector is all-zero. Rounded to 9
   * decimals: the decimal fold makes the dot products exact, but engines
   * disagree by 1 ulp on the double→decimal cast of the element products;
   * 9 dp absorbs that while keeping full ranking resolution. Downstream
   * ordering must use this rounded value (plus an id tiebreak).
   */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(normSq(a))
    val nb = sqrt(normSq(b))
    round(when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb)), 9)
  }

  /**
   * Fast approximate dot: plain sequential double fold. ~100× cheaper than
   * the decimal fold (primitive codegen math, no Decimal allocs). The fold
   * order over an array literal is fixed left-to-right, so the value is
   * deterministic, but it carries normal float accumulation error — use it
   * ONLY as a prefilter with a margin, never as a reported value.
   */
  def dotFast(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /** Fast approximate squared L2 norm (double fold; prefilter-only). */
  def normSqFast(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /**
   * Unrolled fixed-dimension dot product: a flat 64-term (etc.) `+` chain
   * of element_at products. Unlike the higher-order-function folds (which
   * Spark evaluates interpreted, with per-row array allocations), a plain
   * expression chain runs inside WholeStageCodegen as primitive double
   * math — the right prefilter shape when the embedding dimension is known.
   * Left-to-right association keeps the value deterministic.
   */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")).reduce(_ + _)

  /** Unrolled fixed-dimension squared L2 norm (codegen'd; prefilter-only). */
  def normSqUnrolled(a: Column, dim: Int): Column =
    (1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _)

  /**
   * Sign-bucket LSH key for cosine ANN: the sign pattern of the first
   * `bits` dimensions ('1' if >= 0). Axis-aligned sign random projection —
   * the corpus is bucketed by one shuffle (or by write-time partitioning at
   * scale) and queries probe only their own bucket.
   */
  def signBucket(a: Column, bits: Int): Column =
    concat_ws("",
      (1 to bits).map(i =>
        when(element_at(a, i) >= 0.0f, lit("1")).otherwise(lit("0"))): _*)
}
