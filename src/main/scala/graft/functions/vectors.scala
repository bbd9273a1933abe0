package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector Column functions (embeddings.parquet: Array[Float]).
 *
 * All reductions fold element products through DECIMAL(30,20) instead of
 * summing doubles: decimal addition is exact and therefore independent of
 * fold/partition order, so the same cosine comes out of any engine at any
 * parallelism — which is what makes these usable both for the DuckDB
 * correctness oracle and for deterministic re-runs on a 1000-executor
 * cluster. The per-element double products themselves are IEEE-identical
 * everywhere.
 *
 * Two implementation families, same values:
 *  - the `aggregate`/`zip_with` folds work for ANY dimension but are
 *    evaluated interpreted (Spark runs higher-order-function lambdas
 *    outside codegen, with per-row array allocation);
 *  - the `*Unrolled` variants require a known dimension and expand to a
 *    flat expression chain that runs inside WholeStageCodegen — the right
 *    shape for every hot path where the embedding dim is fixed.
 */
object vectors {

  // DECIMAL(30,20) leaves headroom below Spark's precision cap of 38: the
  // (acc + p) result is DECIMAL(31,20) and the cast back to (30,20) only
  // trims unused integer digits — scale stays 20, so the fold is EXACT.
  // (At (38,20) Spark would trim the scale to 19 and round every step.)
  private val Dec = "decimal(30,20)"

  /** Exact dot product of two float/double array columns (as double).
    * Any-dimension interpreted fold; prefer [[dotExactUnrolled]] when the
    * dimension is known. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec),
      (acc, p) => (acc + p).cast(Dec)).cast("double")

  /** Exact squared L2 norm (as double; interpreted fold). */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(Dec)),
      lit(0).cast(Dec),
      (acc, p) => (acc + p).cast(Dec)).cast("double")

  /**
   * Exact dot product as a flat codegen'd decimal chain for a KNOWN
   * dimension. Every partial sum is cast back to DECIMAL(30,20) (trims
   * integer headroom only — exactness preserved), so the value is
   * identical to [[dot]] at ~1-2 orders of magnitude less cost.
   */
  def dotExactUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      (element_at(a, i).cast("double") * element_at(b, i).cast("double")).cast(Dec))
      .reduce((x, y) => (x + y).cast(Dec))
      .cast("double")

  /** Exact squared L2 norm as a codegen'd decimal chain (known dim). */
  def normSqExactUnrolled(a: Column, dim: Int): Column =
    (1 to dim).map { i =>
      val x = element_at(a, i).cast("double")
      (x * x).cast(Dec)
    }.reduce((x, y) => (x + y).cast(Dec)).cast("double")

  /**
   * Cosine similarity, 0.0 when either vector is all-zero. Rounded to 9
   * decimals: the decimal fold makes the dot products exact, but engines
   * disagree by 1 ulp on the double→decimal cast of the element products;
   * 9 dp absorbs that while keeping full ranking resolution. Downstream
   * ordering must use this rounded value (plus an id tiebreak).
   */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), normSq(a), normSq(b))

  /** Cosine assembled from a dot product and PRE-COMPUTED squared norms.
    * In any pairwise operator the norms are per-row, not per-pair: compute
    * them once on each side before the join and pay only the dot per pair. */
  def cosineFromParts(dotAB: Column, normSqA: Column, normSqB: Column): Column =
    round(
      when(normSqA === 0.0 || normSqB === 0.0, lit(0.0))
        .otherwise(dotAB / (sqrt(normSqA) * sqrt(normSqB))), 9)

  /**
   * Fast approximate dot: plain sequential double fold (interpreted).
   * The fold order over an array is fixed left-to-right, so the value is
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
   * Approximate fixed-dimension dot product: a flat `+` chain of
   * element_at products — primitive double math inside WholeStageCodegen,
   * the cheapest possible prefilter shape. Left-to-right association keeps
   * the value deterministic; error over 64 dims is ~1e-13, so prefilters
   * must keep a margin.
   */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double")).reduce(_ + _)

  /** Approximate fixed-dimension squared L2 norm (codegen'd; prefilter-only). */
  def normSqUnrolled(a: Column, dim: Int): Column =
    (1 to dim).map { i =>
      val x = element_at(a, i).cast("double"); x * x
    }.reduce(_ + _)

  /**
   * Sign-bucket LSH key for cosine ANN and embedding near-dup blocking:
   * the sign pattern of the first `bits` dimensions ('1' if >= 0).
   * Axis-aligned sign random projection — the corpus is bucketed by one
   * shuffle (or by write-time partitioning via
   * [[graft.sources.Sink.writePartitioned]] at scale) and probes touch
   * only their own bucket. Bucket count is 2^bits: unlike any fixed
   * attribute key, `bits` is a knob that scales the bucket count with the
   * corpus so per-bucket pair counts stay bounded.
   */
  def signBucket(a: Column, bits: Int): Column =
    concat_ws("",
      (1 to bits).map(i =>
        when(element_at(a, i) >= 0.0f, lit("1")).otherwise(lit("0"))): _*)
}
