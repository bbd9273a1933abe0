package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Plain-Scala replay of the scaled-integer BM25 (Retrieval's scaladoc
    * formulas) over in-memory docs — the cross-check reference. */
  private def refBm25(docs: Seq[(Long, Seq[String])], queries: Seq[(Long, Seq[String])],
      k: Int): Map[(Long, Long), (Long, Long)] = {
    val n = docs.size.toLong
    val t = docs.map(_._2.size.toLong).sum
    val dfm = docs.flatMap { case (_, w) => w.distinct }.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val tfm = docs.map { case (id, w) => id -> w.groupBy(identity).map { case (x, xs) => x -> xs.size.toLong } }.toMap
    val dl = docs.map { case (id, w) => id -> w.size.toLong }.toMap
    val out = for {
      (qid, qterms) <- queries
      (did, _) <- docs
      score = qterms.map { term =>
        val df = dfm.getOrElse(term, 0L)
        val tf = tfm(did).getOrElse(term, 0L)
        if (df == 0 || tf == 0) 0L
        else {
          val s1 = math.floor((100000L * (2 * n - 2 * df + 1)).toDouble / (2 * df + 1).toDouble).toLong
          val s2 = math.floor((10000L * 44 * t * tf).toDouble /
            (20 * t * tf + 6 * t + 18 * dl(did) * n).toDouble).toLong
          s1 * s2
        }
      }.sum
      if score > 0
    } yield (qid, did, score)
    out.groupBy(_._1).flatMap { case (qid, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
        case ((_, did, s), i) => (qid, did) -> ((i + 1).toLong, s)
      }
    }
  }

  private val corpus = Seq(
    1L -> "spark shuffles data across the cluster for joins".split(" ").toSeq,
    2L -> "broadcast joins avoid the shuffle for small tables".split(" ").toSeq,
    3L -> "parquet scans push filters down to the reader".split(" ").toSeq,
    4L -> "the shuffle is the bottleneck for big joins".split(" ").toSeq,
    5L -> "streaming state lives in the state store".split(" ").toSeq)

  test("bm25TopK matches the plain-Scala scaled-integer reference") {
    val docs = corpus.toDF("doc_id", "w")
    val queries = Seq(100L -> Seq("shuffle", "joins"), 200L -> Seq("parquet", "filters"))
    val qt = queries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    val n = corpus.size.toLong
    val t = corpus.map(_._2.size.toLong).sum
    val got = Retrieval.bm25TopK(Retrieval.buildPostings(docs, "doc_id", "w"), qt, n, t, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val want = refBm25(corpus, queries, k = 3)
    assert(got == want)
    // ranking sanity on query 100: docs 2 and 4 each contain BOTH query
    // terms, so the two-term docs must hold ranks 1-2 ahead of any
    // single-term doc (2 before 4 on the doc_id tie)
    val top2 = got.collect { case ((100L, did), (rank, _)) if rank <= 2 => did }.toSet
    assert(top2 == Set(2L, 4L))
  }

  test("duplicate query terms score twice (BM25 duplicate-token semantics)") {
    val docs = corpus.toDF("doc_id", "w")
    val n = corpus.size.toLong
    val t = corpus.map(_._2.size.toLong).sum
    def score(terms: Seq[String]): Long = {
      val qt = terms.map(999L -> _).toDF("query_id", "term")
      Retrieval.bm25TopK(Retrieval.buildPostings(docs, "doc_id", "w"), qt, n, t, k = 1)
        .collect().head.getLong(3)
    }
    assert(score(Seq("shuffle", "shuffle")) == 2 * score(Seq("shuffle")))
  }

  test("topKByGroup equals the pure-window form") {
    val rnd = new scala.util.Random(7)
    val scored = Seq.tabulate(500)(i =>
      (i % 7L, i.toLong, rnd.nextInt(40).toLong)).toDF("query_id", "doc_id", "score")
    val viaHeap = Retrieval.bm25TestTopK(scored, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaHeap == viaWindow)
  }
}
