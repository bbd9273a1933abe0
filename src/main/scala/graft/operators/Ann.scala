package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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
 * 100 TB the corpus would be written partitioned by this key
 * (graft.sources.Sink.writePartitioned) so probes touch one partition
 * (IVF-style; see PAPERS.md similarity-search entry).
 *
 * Top-k selection is two-level: a per-partition bounded heap (mapPartitions
 * — the one place imperative per-partition logic is warranted, since Spark
 * has no partial-aggregating top-k) emits at most |queries|·k rows per
 * partition, then a final window ranks the survivors. A single window over
 * query_id would shuffle ALL n·q scored rows onto q reducers — a q-way
 * parallelism choke on a big corpus.
 */
object Ann {

  private val scoredSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("cand_id", LongType),
    StructField("cosine", DoubleType)))

  /** Per-partition top-k per query via a bounded heap, then a global
    * window over the ≤ partitions·|queries|·k survivors. Ordering is
    * (cosine desc, cand_id asc) on the 9-dp-rounded cosine, so the result
    * is deterministic and identical to a single global window. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val local = scored.mapPartitions { rows =>
      // "better" = (cosine desc, cand_id asc); under this Tuple2 ordering
      // the MAX element is the worst of the kept set, so the PriorityQueue
      // head is exactly the element to evict in O(log k).
      val worstFirst: Ordering[(Double, Long)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      rows.foreach { r =>
        val heap = heaps.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
        heap.enqueue((r.getDouble(2), r.getLong(1)))
        if (heap.size > k) heap.dequeue()
      }
      heaps.iterator.flatMap { case (q, heap) =>
        heap.iterator.map { case (cos, cand) => Row(q, cand, cos) }
      }
    }(RowEncoder.encoderFor(scoredSchema))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    local.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Exact top-k per query by cosine (ties broken on corpus id). The exact
    * norms are per-row (computed once per query / corpus vector before the
    * join), so each pair costs one codegen'd decimal dot chain. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      V.normSqExactUnrolled(col("embedding"), dim).as("qn"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      V.normSqExactUnrolled(col("embedding"), dim).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        V.cosineFromParts(V.dotExactUnrolled(col("qv"), col("cv"), dim),
          col("qn"), col("cn")).as("cosine"))
    topK(scored, k)
  }

  /** LSH-bucketed top-k: probe only the query's sign bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, bits: Int, k: Int,
      dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      V.normSqExactUnrolled(col("embedding"), dim).as("qn"),
      V.signBucket(col("embedding"), bits).as("qb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      V.normSqExactUnrolled(col("embedding"), dim).as("cn"),
      V.signBucket(col("embedding"), bits).as("cb"))
    val scored = c.join(broadcast(q),
        col("qb") === col("cb") && col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        V.cosineFromParts(V.dotExactUnrolled(col("qv"), col("cv"), dim),
          col("qn"), col("cn")).as("cosine"))
    topK(scored, k)
  }
}
