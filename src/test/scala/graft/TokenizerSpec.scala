package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tokenizer

/** BPE merge induction vs a plain-Scala greedy reference. */
class TokenizerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** plain-Scala greedy leftmost merge application — must equal the
    * engine's replace("|l||r|" → "|lr|") on the delimited string. */
  private def applyMerge(seg: List[String], l: String, r: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < seg.length) {
      if (i < seg.length - 1 && seg(i) == l && seg(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.result()
  }

  /** plain-Scala trainBpe: word counts → capped vocab → per-round
    * (pair-count argmax, greedy apply). */
  private def referenceBpe(words: Seq[String], vocabCap: Int, rounds: Int,
      topPairs: Int): Seq[(Long, String, String, String, Long)] = {
    val vocab = words.filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(vocabCap)
    var segs = vocab.map { case (w, c) => (w.map(_.toString).toList, c) }
    def pairCounts = segs.flatMap { case (s, c) =>
      s.zip(s.drop(1)).map(p => (p, c))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val rows = Seq.newBuilder[(Long, String, String, String, Long)]
    (1 to rounds).foreach { k =>
      val ((l, r), c) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
      rows += ((k.toLong, l, r, l + r, c))
      segs = segs.map { case (s, cnt) => (applyMerge(s, l, r), cnt) }
    }
    rows ++= pairCounts.sortBy { case ((l, r), c) => (-c, l, r) }
      .take(topPairs)
      .map { case ((l, r), c) => ((rounds + 1).toLong, l, r, l + r, c) }
    rows.result()
  }

  private def run(docs: Seq[Seq[String]], vocabCap: Int, rounds: Int,
      topPairs: Int) =
    Tokenizer.trainBpe(docs.toDF("w"), "w", vocabCap, rounds, topPairs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("trainBpe matches the plain-Scala greedy reference end to end") {
    // low/lower/lowest ×, newer/wider — the Sennrich toy corpus shape;
    // non-alphabetic tokens must be filtered before counting
    val docs = Seq(
      Seq("low", "low", "lower", "x9", "newest"),
      Seq("low", "lowest", "newest", "newest", "wider"),
      Seq("low", "lower", "new", "n-w", "newest"))
    val words = docs.flatten
    val got = run(docs, vocabCap = 100, rounds = 5, topPairs = 8)
    val want = referenceBpe(words, 100, 5, 8)
    assert(got.sortBy(identity) == want.sortBy(identity))
    // rounds 1..5 each produced exactly one merge
    assert((1 to 5).forall(k => got.count(_._1 == k.toLong) == 1))
  }

  test("greedy leftmost application: aaa merges once, abab merges twice") {
    // one word "aaa": pair (a,a) counts BOTH adjacencies (weight 2),
    // but greedy application folds only the leftmost → [aa, a]
    val got1 = run(Seq(Seq("aaa")), 10, 1, 5)
    assert(got1.contains((1L, "a", "a", "aa", 2L)))
    assert(got1.contains((2L, "aa", "a", "aaa", 1L)))
    // "abab": both (a,b) sites merge in one pass → [ab, ab]
    val got2 = run(Seq(Seq("abab")), 10, 2, 5)
    assert(got2.contains((1L, "a", "b", "ab", 2L)))
    assert(got2.contains((2L, "ab", "ab", "abab", 1L)))
  }

  test("argmax tie-break is (count desc, lhs asc, rhs asc)") {
    // "cd" and "ab" both have pair count 1 — 'a' < 'c' wins round 1
    val got = run(Seq(Seq("cd", "ab")), 10, 1, 5)
    assert(got.filter(_._1 == 1L) == Seq((1L, "a", "b", "ab", 1L)))
  }

  test("tokenizeCorpus applies the learned merges greedily, exact counts") {
    val docs = Seq(
      (1L, Seq("abab", "aaa", "x1")),
      (2L, Seq("zz", "ab")),
      (3L, Seq("9", "--")))
    val df = docs.toDF("doc_id", "w")
    val (merges, _) = Tokenizer.learnMerges(df, "w", 10, 2)
    val got = Tokenizer.tokenizeCorpus(df, "doc_id", "w", merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // plain-Scala expected: greedy merge application in learned order
    val want = docs.map { case (id, ws) =>
      val alpha = ws.filter(_.matches("^[a-z]+$"))
      val nTok = alpha.map { w0 =>
        merges.foldLeft(w0.map(_.toString).toList)(
          (s, m) => applyMerge(s, m.lhs, m.rhs)).size.toLong
      }.sum
      (id, alpha.size.toLong, alpha.map(_.length).sum.toLong, nTok)
    }.toSet
    assert(got == want)
    // a doc with no alphabetic words carries explicit zeros, not nulls
    assert(got.contains((3L, 0L, 0L, 0L)))
    // merges actually compress: doc 1 has 7 chars but fewer BPE tokens
    val d1 = got.find(_._1 == 1L).get
    assert(d1._4 < d1._3)
  }

  test("vocabCap keeps training dictionary-bounded and deterministic") {
    // cap 2 keeps the two most frequent words; the count-1 word "xq"
    // falls off the dictionary and can contribute no pair anywhere
    val got = run(Seq(Seq("zz", "zz", "yy", "yy", "xq")), 2, 1, 5)
    // round 1: (z,z) and (y,y) tie at 2 — lhs asc picks (y,y)
    assert(got.filter(_._1 == 1L) == Seq((1L, "y", "y", "yy", 2L)))
    assert(!got.exists(r => r._2.contains("x") || r._3.contains("q")))
  }
}
