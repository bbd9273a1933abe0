package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Parallelism guard for CPU-bound per-row operators (hashing, signatures,
 * per-pair similarity). Input *bytes* don't predict their cost: a 1 MB
 * parquet file arrives as one input split, which would serialize millions
 * of hash evaluations on one core. If the plan has fewer partitions than
 * the cluster's default parallelism, redistribute round-robin; otherwise
 * pass through untouched — at real scale (thousands of input splits) this
 * is a no-op, so the extra shuffle exists only in the under-parallel case
 * where it is trivially cheap by construction.
 */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
