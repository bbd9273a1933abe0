package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/**
 * Mart builders, re-expressing the reference's dbt models:
 *
 *  - [[incrementalFact]]: dbt/job_dbt/models/marts/fact_jobs.sql —
 *    incremental watermark filter on the fact source + surrogate key +
 *    broadcast left join onto the dimension.
 *  - [[scd1Dim]]: dbt/job_dbt/models/marts/dim_companies.sql — SCD Type-1,
 *    latest observation per key wins.
 *
 * Scale notes (SURVEY.md §5): the watermark predicate is a plain pushed
 * filter (partition-pruning on date at real scale); the dim side is
 * broadcast so the fact never shuffles for the join; SCD1 is one shuffle
 * on the dim key.
 */
object Marts {

  /**
   * Incremental fact build: rows of `fact` with `tsCol` past the watermark,
   * left-joined (broadcast) to `dim` on the key, plus an md5 surrogate uid
   * over the dim's natural name (fact_jobs.sql company_id_normalized).
   */
  def incrementalFact(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, dimName: String, tsCol: String, watermark: String): DataFrame = {
    fact.filter(col(tsCol) > lit(watermark))
      .join(broadcast(dim), col(factKey) === col(dimKey), "left")
      .withColumn("dim_uid",
        md5(T.normKey(coalesce(col(dimName), lit("unknown")))))
  }

  /** SCD Type-1: one row per key, latest by (tsCol desc, tiebreak desc). */
  def scd1Dim(observations: DataFrame, key: String, tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol).desc, col(tiebreak).desc)
    observations.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
