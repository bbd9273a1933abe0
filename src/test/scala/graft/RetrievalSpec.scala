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

  test("bm25TopK headroom guards fail LOUDLY even where their products overflow Long") {
    val docs = corpus.toDF("doc_id", "w")
    val qt = Seq(100L -> "shuffle").toDF("query_id", "term")
    val postings = Retrieval.buildPostings(docs, "doc_id", "w")
    // t large enough that scale2·44·t wraps Long: the old plain-* guard
    // could wrap to a small/negative product and spuriously pass; the
    // multiplyExact form must throw (ArithmeticException), never proceed
    val hugeT = 3000000000000000000L // 3e18: 44·1e4·t >> 2^63
    intercept[ArithmeticException] {
      Retrieval.bm25TopK(postings, qt, n = 10L, t = hugeT, k = 1)
    }
    // and a merely-too-big (non-wrapping) t still fails the require:
    // 44·1e4·1e9 ≈ 4.4e14 < 2^63 but > 2^53/maxTf
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(postings, qt, n = 10L, t = 1000000000L, k = 1)
    }
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

  test("tf-idf ranks a doc-unique term over shared and ubiquitous ones") {
    // every doc contains "the" (df = n -> tiny idf); "zebra" is unique
    // to doc 1; "shuffle" is shared by two docs
    val docs = Seq(
      1L -> "the zebra shuffle".split(" ").toSeq,
      2L -> "the shuffle runs".split(" ").toSeq,
      3L -> "the reader scans".split(" ").toSeq).toDF("doc_id", "w")
    val n = 3L
    val postings = Retrieval.buildPostings(docs, "doc_id", "w")
    val dfT = Retrieval.docFreq(postings)
    // replicate t14's scoring inline (tf * floor-scaled rational idf)
    val scored = postings.join(dfT, Seq("term"))
      .withColumn("s1", floor(
        (lit(100000L) * (lit(2 * n) - lit(2) * col("df") + lit(1))).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double")).cast("long"))
      .select(col("doc_id"), col("term"), (col("tf") * col("s1")).as("score"))
      .filter(col("doc_id") === 1L)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(scored("zebra") > scored("shuffle"), "df=1 term must beat df=2")
    assert(scored("shuffle") > scored("the"), "df=2 term must beat df=n")
    // df = n makes the rational idf (2n-2n+1)/(2n+1) < 1 -> s1 underflows
    // to a small positive floor, so ubiquitous terms sink without a
    // stopword list but never go negative on a present term
    assert(scored("the") > 0)
  }

  test("RRF: a doc on both lists outranks single-list docs; floor contributions exact") {
    def rrf(rank: Long): Long = math.floor(1000000.0 / (60 + rank)).toLong
    val bm = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val fused = bm.unionAll(vec)
      .select(col("query_id"), col("doc_id"),
        floor(lit(1000000L).cast("double") / (lit(60L) + col("rank")).cast("double"))
          .cast("long").as("score"))
      .groupBy("query_id", "doc_id").agg(sum("score").as("score"))
    val got = Retrieval.topKByGroup(fused, 3)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    // doc 20: rank 2 lexical + rank 1 dense > doc 10's single rank 1
    assert(got(20L) == ((1L, rrf(2) + rrf(1))))
    assert(got(10L) == ((2L, rrf(1))))
    assert(got(30L) == ((3L, rrf(2))))
  }

  test("recall audit invariant: full probe coverage makes LSH == exact (recall 1.0)") {
    import graft.operators.Ann
    val rnd = new scala.util.Random(17)
    val vecs = Seq.tabulate(60)(i => (i.toLong, Seq.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // probeRadius = bits (2 over 2 — the operator caps the radius at 2):
    // every bucket is within hamming reach, so the candidate set is the
    // whole corpus and the audit must read 10/10 for every query — the
    // q6 computation's fixed point
    assert(ranked(Ann.lshTopK(q, emb, bits = 2, k = 10, probeRadius = 2)) ==
      ranked(Ann.bruteForceTopK(q, emb, 10)))
  }

  test("topKByGroup equals the pure-window form") {
    val rnd = new scala.util.Random(7)
    val scored = Seq.tabulate(500)(i =>
      (i % 7L, i.toLong, rnd.nextInt(40).toLong)).toDF("query_id", "doc_id", "score")
    val viaHeap = Retrieval.topKByGroup(scored, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaHeap == viaWindow)
  }

  test("compactSegments: posting multiset preserved, per-file term ranges disjoint") {
    val root = java.nio.file.Files.createTempDirectory("graft-w22").toString
    val docs = corpus.map { case (id, w) => (id, w) }.toDF("doc_id", "w")
    (0 until 3).foreach { i =>
      Retrieval.indexBatchAppend(root, docs.filter(col("doc_id") % 3 === i), "doc_id", "w", i)
    }
    val segSchema = "term STRING, doc_id BIGINT, dl BIGINT, tf BIGINT"
    val before = spark.read.schema(segSchema + ", batch INT")
      .parquet(s"$root/postings").select("term", "doc_id", "dl", "tf")
      .collect().map(_.toSeq).sortBy(_.toString)
    val dest = Retrieval.compactSegments(spark, root, targetRowsPerFile = 12L)
    val compacted = spark.read.schema(segSchema).parquet(dest)
    val after = compacted.collect().map(_.toSeq).sortBy(_.toString)
    assert(after.toSeq == before.toSeq)           // layout-only: multiset identical
    Retrieval.assertDisjointFileRanges(compacted, "term")  // must not throw
  }

  test("assertDisjointFileRanges throws on a full-range-per-file layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w22-bad").toString + "/flat"
    val rows = Seq(("alpha", 1L), ("omega", 2L)).toDF("term", "doc_id")
    rows.coalesce(1).write.mode("append").parquet(dir)   // file 1: [alpha, omega]
    rows.coalesce(1).write.mode("append").parquet(dir)   // file 2: [alpha, omega]
    val df = spark.read.schema("term STRING, doc_id BIGINT").parquet(dir)
    val ex = intercept[IllegalStateException] {
      Retrieval.assertDisjointFileRanges(df, "term")
    }
    assert(ex.getMessage.contains("ranges overlap"))
  }
}
