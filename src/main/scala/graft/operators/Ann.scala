package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{vectors => V}

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * [[bruteForceTopK]] is the exact baseline: the (small) query set is
 * broadcast against the corpus, so the corpus is scanned exactly once with
 * no shuffle of the big side — the correct plan when |queries| ≪ |corpus|.
 *
 * [[lshTopK]] is the scale path: corpus and queries are bucketed by a
 * sign-projection LSH key (graft.functions.vectors.signBucket); each query
 * probes only its own bucket, turning the scan into a bucket-key join. At
 * 100 TB the corpus would be written partitioned by this key so probes
 * touch one partition (IVF-style; see PAPERS.md similarity-search entry).
 */
object Ann {

  /** Exact top-k per query by cosine (ties broken on corpus id). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = Par.ensure(corpus).select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), V.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** LSH-bucketed top-k: probe only the query's sign bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, bits: Int, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      V.signBucket(col("embedding"), bits).as("qb"))
    val c = Par.ensure(corpus).select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      V.signBucket(col("embedding"), bits).as("cb"))
    val scored = c.join(broadcast(q), col("qb") === col("cb") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), V.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
