package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Temporal}

class TemporalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // -------------------------------------------------------- asofJoin
  private val states = Seq(
    (1L, ts("2024-01-15 10:00:00"), 10.0),
    (1L, ts("2024-01-15 10:30:00"), 20.0),
    (2L, ts("2024-01-15 11:00:00"), 99.0))
    .toDF("user_id", "ts", "v")

  test("asofJoin picks the latest state at or before each event, null before any") {
    val evts = Seq(
      (100L, 1L, ts("2024-01-15 09:59:59")), // before any state -> null
      (101L, 1L, ts("2024-01-15 10:00:00")), // tie: state AT event ts counts (<=)
      (102L, 1L, ts("2024-01-15 10:29:59")), // between states -> first
      (103L, 1L, ts("2024-01-15 12:00:00")), // after all -> latest
      (104L, 2L, ts("2024-01-15 11:30:00")), // other key
      (105L, 3L, ts("2024-01-15 11:30:00"))) // key with no states
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.asofJoin(evts, states, Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(
      100L -> None, 101L -> Some(10.0), 102L -> Some(10.0),
      103L -> Some(20.0), 104L -> Some(99.0), 105L -> None))
  }

  test("asofJoin matches a naive per-event argmax reference on random data") {
    val rnd = new scala.util.Random(7)
    val st = (1 to 60).map(_ =>
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique per (key, ts)
    val ev = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
    val got = Temporal.asofJoin(
        ev.toDF("event_id", "user_id", "ts"),
        st.toDF("user_id", "ts", "v"), Seq("user_id"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val expect = ev.map { case (id, u, t) =>
      val cand = st.filter(s => s._1 == u && !s._2.after(t))
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == expect)
  }

  test("asofLookup == asofJoin on random data, via a broadcast join (no fact window)") {
    val rnd = new scala.util.Random(11)
    val dim = (1 to 40).map(_ =>
      (rnd.nextInt(3).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique per (key, ts)
    val ev = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
    val facts = ev.toDF("event_id", "k", "ts")
    val d = dim.toDF("k", "ts", "v")
    val got = Temporal.asofLookup(facts, d, "k", "ts", "ts", Seq("v"))
    val viaWindow = Temporal.asofJoin(facts, d, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      == viaWindow, "small-dim lookup must equal the window as-of")
    // and the PLAN is the small-dim shape: a broadcast join, no window
    // over the facts (the whole reason this variant exists)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected a broadcast join:\n$plan")
  }

  test("asofJoin degrades deterministically on duplicate (key, ts) states") {
    // contract violation (right not unique per key+ts): the window orders
    // on _state last, so the pick is the LARGEST state struct — pinned
    // here so a violating input never flips between runs/partitionings
    val events = Seq((10L, ts("2024-01-15 10:00:00"), 1L)).toDF("user_id", "ts", "event_id")
    val states = Seq(
      (10L, ts("2024-01-15 09:00:00"), "a"),
      (10L, ts("2024-01-15 09:00:00"), "b")).toDF("user_id", "sts", "v")
    (1 to 3).foreach { _ =>
      val got = Temporal.asofJoin(events, states, Seq("user_id"), "ts", "sts", Seq("v"))
        .select("asof_v").collect().map(_.getString(0)).toSeq
      assert(got == Seq("b"))
    }
  }

  test("asofLookup degrades deterministically on duplicate (key, dimTs) rows") {
    // contract violation (dim not unique per key+dimTs): without the
    // pre-aggregate the lead() ranges would be ambiguous and the left
    // join would fan the fact out to BOTH dup rows; the pinned behavior
    // mirrors asofJoin's — the MAX payload struct wins, one row out
    val facts = Seq((100L, 1L, ts("2024-01-15 10:00:00")))
      .toDF("event_id", "k", "ts")
    val dim = Seq(
      (1L, ts("2024-01-15 09:00:00"), "a"),
      (1L, ts("2024-01-15 09:00:00"), "b")).toDF("k", "dts", "v")
    (1 to 3).foreach { _ =>
      val got = Temporal.asofLookup(facts, dim, "k", "ts", "dts", Seq("v"))
        .collect()
      assert(got.length == 1, "duplicate dim timestamps must not fan facts out")
      assert(got.head.getString(3) == "b",
        "the MAX payload struct wins (asofJoin's pinned degradation)")
    }
  }

  test("asofJoin accepts non-orderable (map-typed) state columns") {
    // the deterministic tie-break orders on _state only when the struct
    // is orderable; a map-typed state must not break the analyzer
    val events = Seq((1L, ts("2024-01-15 10:00:00"))).toDF("user_id", "ts")
    val states = Seq((1L, ts("2024-01-15 09:00:00"), Map("a" -> 1)))
      .toDF("user_id", "sts", "props")
    val got = Temporal.asofJoin(events, states, Seq("user_id"), "ts", "sts", Seq("props"))
      .select("asof_props").collect().head.getMap[String, Int](0)
    assert(got == Map("a" -> 1))
  }

  // -------------------------------------------------------- rangeJoin
  test("rangeJoin: half-open bounds, bin-straddling intervals, empty intervals") {
    val evts = Seq(
      (1L, 10L, ts("2024-01-15 10:00:00")), // == start -> in
      (2L, 10L, ts("2024-01-15 11:59:59")), // just inside
      (3L, 10L, ts("2024-01-15 12:00:00")), // == end -> OUT (half-open)
      (4L, 10L, ts("2024-01-15 09:59:59")), // before -> out
      (5L, 20L, ts("2024-01-15 10:30:00"))) // other key, interval straddles bins
      .toDF("event_id", "user_id", "ts")
    val ivs = Seq(
      (10L, ts("2024-01-15 10:00:00"), ts("2024-01-15 12:00:00")),
      (20L, ts("2024-01-15 09:30:00"), ts("2024-01-15 11:30:00")), // straddles 2h bins
      (20L, ts("2024-01-15 08:00:00"), ts("2024-01-15 08:00:00"))) // empty: end == start
      .toDF("user_id", "win_start", "win_end")
    val got = Temporal.rangeJoin(evts, "ts", ivs, "win_start", "win_end",
        Seq("user_id"), binSeconds = 7200L)
      .select("event_id", "win_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(got == Set(
      (1L, ts("2024-01-15 10:00:00")),
      (2L, ts("2024-01-15 10:00:00")),
      (5L, ts("2024-01-15 09:30:00"))))
  }

  test("rangeJoin matches the naive inequality join on random data across bin sizes") {
    val rnd = new scala.util.Random(13)
    val ev = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, new Timestamp(1700000000000L + rnd.nextInt(200000) * 1000L)))
    val iv = (1 to 50).map { i =>
      val s = 1700000000000L + rnd.nextInt(200000) * 1000L
      (rnd.nextInt(5).toLong, new Timestamp(s), new Timestamp(s + (rnd.nextInt(30000) + 1) * 1000L), i.toLong)
    }
    val expect = (for {
      (eid, u, t) <- ev
      (ku, s, e, wid) <- iv
      if ku == u && !t.before(s) && t.before(e)
    } yield (eid, wid)).toSet
    for (bin <- Seq(1000L, 7200L, 100000L)) {
      val got = Temporal.rangeJoin(
          ev.toDF("event_id", "user_id", "ts"),
          "ts", iv.toDF("user_id", "win_start", "win_end", "win_id"),
          "win_start", "win_end", Seq("user_id"), binSeconds = bin)
        .select("event_id", "win_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"bin=$bin")
    }
  }

  test("rangeJoin fails fast on an interval exceeding maxBinsPerInterval") {
    // the SCD sentinel-end trap: an open-ended interval with small bins
    // would explode to millions of rows per interval — the guard must
    // raise before the explode, not OOM mid-shuffle
    val evts = Seq((1L, 10L, ts("2024-01-15 10:00:00"))).toDF("event_id", "user_id", "ts")
    val openEnded = Seq((10L, ts("2024-01-15 10:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("user_id", "win_start", "win_end")
    val e = intercept[Exception] {
      Temporal.rangeJoin(evts, "ts", openEnded, "win_start", "win_end",
        Seq("user_id"), binSeconds = 60L, maxBinsPerInterval = 1000L).count()
    }
    assert(e.getMessage.contains("rangeJoin: interval spans more than 1000 bins"))
    // wider bins bring the same interval under the cap (the documented fix)
    val n = Temporal.rangeJoin(evts, "ts", openEnded, "win_start", "win_end",
      Seq("user_id"), binSeconds = 400L * 365 * 86400, maxBinsPerInterval = 1000L).count()
    assert(n == 1L)
  }

  // ------------------------------------------------------- sessionize
  test("sessionize merges events up to AND INCLUDING the gap, splits past it") {
    // session_window's merge rule is diff <= gap (an event landing exactly
    // on the previous window's end extends the session) — asserted here
    // because the a6 oracle encodes the same <= and a strict < would pass
    // every gate until real data hit the boundary.
    val evts = Seq(
      (1L, ts("2024-01-15 10:00:00"), 1.0),
      (1L, ts("2024-01-15 10:20:00"), 2.0), // 20 min -> same session
      (1L, ts("2024-01-15 10:50:00"), 3.0), // EXACTLY 30 min -> still same session
      (1L, ts("2024-01-15 11:20:01"), 4.0), // 30 min 1 s -> NEW session
      (2L, ts("2024-01-15 10:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.sessionize(evts, "user_id", "ts", "30 minutes", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == Set(
      (1L, ts("2024-01-15 10:00:00"), ts("2024-01-15 11:20:00"), 3L, 6.0),
      (1L, ts("2024-01-15 11:20:01"), ts("2024-01-15 11:50:01"), 1L, 4.0),
      (2L, ts("2024-01-15 10:00:00"), ts("2024-01-15 10:30:00"), 1L, 5.0)))
  }

  // ---------------------------------------------------- columnProfile
  test("multiTouchAttribution: journeys split at conversions; lookback, ties, credits") {
    // user 1: touches e1,e2 -> conv C1(e3); touch e4 -> conv C2(e5);
    //         touch e6 with NO following conversion -> dropped
    // user 2: touch e10 is 8 days before its conversion -> outside 7d lookback
    // user 3: touch e20 at the SAME ts as conv e21 (touch id smaller ->
    //         attributes); touch e22 same ts as conv e21 but LARGER id ->
    //         lexicographically after, no conversion follows -> dropped
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "click"),
      (1L, ts("2024-01-02 09:00:00"), 3L, "purchase"),
      (1L, ts("2024-01-03 09:00:00"), 4L, "view"),
      (1L, ts("2024-01-04 09:00:00"), 5L, "purchase"),
      (1L, ts("2024-01-05 09:00:00"), 6L, "view"),
      (2L, ts("2024-01-01 00:00:00"), 10L, "click"),
      (2L, ts("2024-01-09 00:00:01"), 11L, "purchase"),
      (3L, ts("2024-01-01 12:00:00"), 20L, "view"),
      (3L, ts("2024-01-01 12:00:00"), 21L, "purchase"),
      (3L, ts("2024-01-01 12:00:00"), 22L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.multiTouchAttribution(rows, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click"), "purchase", "7 DAYS")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getString(3), r.getInt(4), r.getLong(5), r.getBoolean(6),
          r.getBoolean(7), r.getLong(8))).toMap
    assert(got.keySet == Set((1L, 3L, 1L), (1L, 3L, 2L), (1L, 5L, 4L), (3L, 21L, 20L)))
    assert(got((1L, 3L, 1L)) == (("view", 1, 2L, true, false, 500000L)))
    assert(got((1L, 3L, 2L)) == (("click", 2, 2L, false, true, 500000L)))
    assert(got((1L, 5L, 4L)) == (("view", 1, 1L, true, true, 1000000L)))
    assert(got((3L, 21L, 20L)) == (("view", 1, 1L, true, true, 1000000L)))
  }

  test("chained asofJoin builds point-in-time features: no future state, exact-ts visible") {
    // labels at 10:00 and 12:00; views at 09:00, 10:00 (exact-ts ->
    // visible to label 1), 11:00 (future for label 1, past for label 2)
    val labels = Seq((1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (2L, 102L, ts("2024-01-01 08:00:00"))) // before any view -> null
      .toDF("user_id", "label_id", "label_ts")
    val views = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 11:00:00"), 3L),
      (2L, ts("2024-01-01 09:30:00"), 1L))
      .toDF("user_id", "fts", "n_views")
    val got = Temporal.asofJoin(labels, views, Seq("user_id"),
      "label_ts", "fts", Seq("n_views", "fts"))
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getTimestamp(4)))).toMap
    assert(got(100L) == ((Some(2L), Some(ts("2024-01-01 10:00:00"))))) // exact ts visible
    assert(got(101L) == ((Some(3L), Some(ts("2024-01-01 11:00:00"))))) // latest past
    assert(got(102L) == ((None, None))) // nothing precedes -> null, never future
  }

  test("multiTouchAttribution == attributionState on random event sets (cross-form invariant)") {
    // the window form and the stateful fold implement one semantics two
    // ways; random inputs hunt the seams (ties, empty journeys, pending
    // tails) that crafted fixtures miss
    val rnd = new scala.util.Random(97)
    val types = Array("view", "click", "purchase", "error")
    val rows = (1 to 400).map { i =>
      (rnd.nextInt(12).toLong + 1L,
        ts(f"2024-01-${1 + rnd.nextInt(20)}%02d ${rnd.nextInt(24)}%02d:00:00"),
        i.toLong,
        types(rnd.nextInt(types.length)))
    }.toDF("user_id", "ts", "event_id", "event_type")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7), r.getLong(8))
    val batch = Temporal.multiTouchAttribution(rows, "user_id", "ts",
      "event_id", "event_type", Seq("view", "click"), "purchase", "3 DAYS")
      .collect().map(key).toSet
    val fold = graft.streaming.EventStream.attributionState(rows,
      Seq("view", "click"), "purchase", 3L * 86400L * 1000000L)
      .collect().map(key).toSet
    assert(batch == fold, "window form and stateful fold must agree")
    assert(batch.nonEmpty, "fixture must produce journeys")
  }

  test("columnProfile: counts, exact distinct, numeric-only min/max") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(-1.0)),
      (Some(2L), Some("b"), None))
      .toDF("k", "s", "x")
    val got = Profile.columnProfile(df, Seq("k", "s", "x"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(got("k") == ((3L, 3L, 2L, Some(1.0), Some(2.0))))
    assert(got("s") == ((3L, 2L, 2L, None, None))) // string: no numeric min/max
    assert(got("x") == ((3L, 2L, 2L, Some(-1.0), Some(2.5))))
  }

  test("columnProfile resolves names like Spark does (case-insensitive) and rejects dups") {
    val df = Seq((1L, 2.5)).toDF("k", "x")
    // a differently-cased numeric column must still profile as numeric
    val got = Profile.columnProfile(df, Seq("X")).collect().head
    assert(got.getString(0) == "x" && got.getDouble(4) == 2.5 && got.getDouble(5) == 2.5)
    intercept[IllegalArgumentException] { Profile.columnProfile(df, Seq("k", "K")) }
    intercept[IllegalArgumentException] { Profile.columnProfile(df, Seq("nope")) }
  }

  // ------------------------------------------------------- saltedJoin
  test("saltedJoin equals the plain join on skewed data; right joins rejected") {
    val rnd = new scala.util.Random(3)
    // hot key: half the fact rows land on key 1
    val fact = (1 to 400).map(i =>
      (i.toLong, if (rnd.nextBoolean()) 1L else rnd.nextInt(20).toLong, rnd.nextDouble()))
      .toDF("row_id", "k", "v")
    // dim with duplicate keys (each fact row must meet BOTH dim rows once)
    val dim = ((0 to 15).map(k => (k.toLong, s"a$k")) ++ Seq((1L, "b1")))
      .toDF("k", "attr")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id", "k", "v", "attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), Option(r.getString(3))))
        .sortBy(t => (t._1, t._4)).toSeq
    for (jt <- Seq("inner", "left")) {
      val salted = canon(graft.operators.Joins.saltedJoin(
        fact, dim, Seq("k"), saltBy = "row_id", nSalts = 7, joinType = jt))
      val plain = canon(fact.join(dim, Seq("k"), jt))
      assert(salted == plain, jt)
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.Joins.saltedJoin(fact, dim, Seq("k"), "row_id", 7, "right")
    }
  }

  // -------------------------------------------------------- sequences
  test("Curate.sequences: time order, event-id tie-break, output cap") {
    val evts = Seq(
      (1L, ts("2024-01-15 10:02:00"), 12L),
      (1L, ts("2024-01-15 10:01:00"), 11L),
      (1L, ts("2024-01-15 10:02:00"), 10L), // same ts as 12 -> id breaks the tie
      (1L, ts("2024-01-15 10:03:00"), 13L), // beyond maxLen=3 -> cut from seq
      (2L, ts("2024-01-15 10:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val got = graft.operators.Curate.sequences(evts, "user_id", Seq("ts"), "event_id", maxLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 4L, "11,10,12"), (2L, 1L, "20")))
  }

  // ------------------------------------------------ flagContaminated
  test("flagContaminated: leaked benchmark spans flag, clean docs don't") {
    // bench doc has 6 words -> exactly two 5-grams
    val bench = Seq(Tuple1("alpha beta gamma delta epsilon zeta")).toDF("text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta GAMMA  delta epsilon end"), // one shared gram (case/ws normalized)
      (2L, "completely unrelated sentence about spark engines only"),
      (3L, "alpha beta gamma delta epsilon zeta verbatim leak here"), // both grams
      (4L, "short doc")) // under n words -> no grams at all
      .toDF("doc_id", "text")
    val got = graft.operators.Curate
      .flagContaminated(corpus, "doc_id", "text", bench, "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 2L))
  }

  // ---------------------------------------------------- packSequences
  test("packSequences: concat-then-chunk pack assignment, doc spanning packs") {
    // single shard (nShards=1) so offsets are fully predictable:
    // id order 1..4, tokens 3,4,5,2 -> starts 0,3,7,12; budget 5 ->
    // packs 0,0,1,2 (doc 3 STARTS in pack 1 though it spans into 2)
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = graft.operators.Curate.packSequences(
        docs, "doc_id", graft.functions.text.tokenCountWs(col("text")),
        nShards = 1, budget = 5L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 2L, 7L), (1L, 1L, 5L), (2L, 1L, 2L)))
  }

  // ---------------------------------------- approx sketches (scale path)
  test("approx_count_distinct and approx_percentile stay inside their error bounds") {
    // The oracle-gated q2/r4 use EXACT distinct/percentile; at 100 TB the
    // real path is the sketch version (HLL++ / KLL — no Expand, bounded
    // state). Not hash-gateable across engines, so the contract tested
    // here is the one that matters: relative error within the configured
    // bound against the exact answer.
    val n = 20000
    val df = spark.range(n).selectExpr(
      "cast(id % 7919 as string) as s", // 7919 distinct values
      "cast(id as double) as x")
    val row = df.agg(
      expr("approx_count_distinct(s, 0.02)").as("ad"),
      expr("approx_percentile(x, array(0.25, 0.5, 0.75), 10000)").as("ap")).head()
    val ad = row.getLong(0)
    assert(math.abs(ad - 7919.0) / 7919.0 < 0.05, s"approx distinct $ad vs 7919")
    val ap = row.getSeq[Double](1)
    val exact = Seq(0.25, 0.5, 0.75).map(p => p * (n - 1))
    ap.zip(exact).foreach { case (got, want) =>
      assert(math.abs(got - want) <= n / 1000.0 + 1, s"approx percentile $got vs $want")
    }
  }

  // ----------------------------------------------------- chunkWindows
  test("chunkWindows: overlap, short tail, single-window doc") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens: chunk 4 stride 3 -> starts 0,3,6
      (2L, "a b"), // 2 tokens -> one short window
      (3L, " ")) // empty after normalize -> no windows
      .toDF("doc_id", "text")
    val got = graft.operators.Profile.chunkWindows(docs, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, "t0 t1 t2 t3", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t6", 1L), // tail: start 6 < 7, one token left
      (2L, 0L, "a b", 2L)))
  }

  // -------------------------------------------------------- vocabTopK
  test("vocabTopK: tf/df counts, (tf desc, token) order, top-n cut") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "a cat and a dog"))
      .toDF("doc_id", "text")
    val got = Profile.vocabTopK(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tf: the=3, a=2, cat=2, dog=2, sat=2, ... -> top-4 by (tf desc, token asc)
    assert(got.toSeq == Seq(
      ("the", 3L, 2L), ("a", 2L, 1L), ("cat", 2L, 2L), ("dog", 2L, 2L)))
  }

  // --------------------------------------------------- windowedFunnel
  test("windowedFunnel: window cuts slow conversions; DP beats greedy first-match") {
    def min5(n: Int) = ts(f"2024-01-01 ${10 + n / 12}%02d:${(n % 12) * 5}%02d:00")
    val win15min = 15L * 60 * 1000000
    val ev = Seq(
      // user 1: click then view 5 min later, purchase 5 min after that
      (1L, min5(0), 1L, "click"), (1L, min5(1), 2L, "view"), (1L, min5(2), 3L, "purchase"),
      // user 2: view 20 min after click — outside the 15-min window
      (2L, min5(0), 4L, "click"), (2L, min5(4), 5L, "view"),
      // user 3: THE GREEDY TRAP — view@5min (greedy pick), purchase@25min
      // is outside ITS window, but view@15min still converts: greedy
      // stalls at step 2, the attainability DP completes the funnel
      (3L, min5(0), 6L, "click"), (3L, min5(1), 7L, "view"),
      (3L, min5(3), 8L, "view"), (3L, min5(5), 9L, "purchase"),
      // user 4: purchase BEFORE the view — order still matters
      (4L, min5(0), 10L, "click"), (4L, min5(1), 11L, "purchase"),
      (4L, min5(2), 12L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.windowedFunnel(ev, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view", "purchase"), win15min)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // step 1: users 1,2,3,4; step 2: 1,3 (in-window view), 4 (view 10min);
    // step 3: 1 and 3 (via the SECOND view) — user 4's purchase precedes its view
    assert(got == Map(1 -> 4L, 2 -> 3L, 3 -> 2L))
  }

  test("windowedFunnel with a huge window equals the unwindowed funnel") {
    val rnd = new scala.util.Random(17)
    val types = Seq("click", "view", "purchase", "error")
    val ev = Seq.tabulate(400)(i => (rnd.nextInt(25).toLong,
      ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"),
      i.toLong, types(rnd.nextInt(4))))
      .toDF("user_id", "ts", "event_id", "event_type")
    val steps = Seq("click", "view", "purchase")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    val unbounded = rows(Temporal.funnel(ev, "user_id", "ts", "event_id",
      "event_type", steps))
    val huge = rows(Temporal.windowedFunnel(ev, "user_id", "ts", "event_id",
      "event_type", steps, 365L * 86400 * 1000000))
    assert(huge == unbounded)
  }

  test("windowedFunnel matches a brute-force chain search on random data") {
    val rnd = new scala.util.Random(19)
    val types = Seq("click", "view", "purchase")
    val win = 3L * 3600 * 1000000 // 3 hours
    val raw = Seq.tabulate(300)(i => (rnd.nextInt(20).toLong,
      ts(f"2024-01-0${1 + rnd.nextInt(5)} ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      i.toLong, types(rnd.nextInt(3))))
    val ev = raw.toDF("user_id", "ts", "event_id", "event_type")
    val steps = Seq("click", "view", "purchase")
    // brute force: per user, try every (a, b, c) chain
    val byUser = raw.groupBy(_._1)
    def after(a: (Long, java.sql.Timestamp, Long, String),
        b: (Long, java.sql.Timestamp, Long, String)) =
      b._2.getTime > a._2.getTime || (b._2.getTime == a._2.getTime && b._3 > a._3)
    def inWin(a: (Long, java.sql.Timestamp, Long, String),
        b: (Long, java.sql.Timestamp, Long, String)) =
      (b._2.getTime - a._2.getTime) * 1000L <= win
    val expect = (1 to 3).map { k =>
      k -> byUser.count { case (_, evs) =>
        k match {
          case 1 => evs.exists(_._4 == "click")
          case 2 => evs.exists(a => a._4 == "click" && evs.exists(b =>
            b._4 == "view" && after(a, b) && inWin(a, b)))
          case 3 => evs.exists(a => a._4 == "click" && evs.exists(b =>
            b._4 == "view" && after(a, b) && inWin(a, b) && evs.exists(c =>
              c._4 == "purchase" && after(b, c) && inWin(b, c))))
        }
      }.toLong
    }.toMap
    val got = Temporal.windowedFunnel(ev, "user_id", "ts", "event_id",
      "event_type", steps, win)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  // -------------------------------------------------- slidingDistinct
  test("slidingDistinct: trailing window dedups multi-day users, skips silent days") {
    val ev = Seq(
      // user 1 active on days 1, 2, 3; user 2 on day 1 twice (two events);
      // user 3 on day 5 only; nobody on day 4
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-05 12:00:00")))
      .toDF("user_id", "ts")
    val got3 = Temporal.slidingDistinct(ev, "user_id", "ts", 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 1: {1,2}; day 2: window [day-2,day] -> {1,2}, user 1 active on
    // two window days counts ONCE; day 3: {1,2}; day 4 has no events ->
    // not reported; day 5: window [3,5] -> {1 (active day 3), 3}
    assert(got3 == Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-03" -> 2L,
      "2024-01-05" -> 2L))
  }

  test("slidingDistinct window=1 is per-day distinct; random data matches naive") {
    val rnd = new scala.util.Random(7)
    val ev = Seq.fill(300)((rnd.nextInt(10).toLong,
      ts(f"2024-02-${1 + rnd.nextInt(20)}%02d 0${rnd.nextInt(10)}:00:00")))
      .toDF("user_id", "ts")
    val userDays = ev.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate)).distinct
    val days = userDays.map(_._2).distinct
    for (w <- Seq(1, 7)) {
      val got = Temporal.slidingDistinct(ev, "user_id", "ts", w)
        .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
      val expect = days.map(d => d -> userDays.collect {
        case (u, ud) if !ud.isAfter(d) && ud.isAfter(d.minusDays(w)) => u
      }.distinct.size.toLong).toMap
      assert(got == expect, s"window $w")
    }
  }

  // ------------------------------------------------------ overlapJoin
  private def iv(id: Long, k: Long, s: String, e: String) =
    (id, k, ts(s), ts(e))

  test("overlapJoin: half-open semantics, nesting, keys, single emission per pair") {
    val left = Seq(
      iv(10L, 1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      iv(11L, 1L, "2024-01-01 15:00:00", "2024-01-01 16:00:00"),
      iv(12L, 2L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
      .toDF("l_id", "user_id", "l_start", "l_end")
    val right = Seq(
      // overlaps 10 (partial), same key
      iv(20L, 1L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"),
      // touches 10 exactly at its end: half-open -> NO overlap
      iv(21L, 1L, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
      // nested inside 10, crosses no bin boundary
      iv(22L, 1L, "2024-01-01 10:15:00", "2024-01-01 10:45:00"),
      // overlaps 12 but key 2 -- joins 12 only, never 10
      iv(23L, 2L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"),
      // long interval covering 10 across MANY bins -> still one row
      iv(24L, 1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("r_id", "user_id", "r_start", "r_end")
    val got = Temporal.overlapJoin(left, "l_start", "l_end",
        right, "r_start", "r_end", Seq("user_id"), binSeconds = 3600L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
    assert(got.length == got.distinct.length, "each pair must emit exactly once")
    assert(got.toSet == Set(
      (10L, 20L), (10L, 22L), (10L, 24L), (11L, 24L), (12L, 23L)))
  }

  test("overlapJoin matches the naive quadratic reference on random intervals") {
    val rnd = new scala.util.Random(23)
    def mk(n: Int, tag: String) = Seq.tabulate(n) { i =>
      val start = rnd.nextInt(72000)
      (i.toLong, rnd.nextInt(4).toLong,
        new Timestamp(1700000000000L + start * 1000L),
        new Timestamp(1700000000000L + (start + 60 + rnd.nextInt(7200)) * 1000L))
    }
    val ls = mk(60, "l"); val rs = mk(60, "r")
    val got = Temporal.overlapJoin(
        ls.toDF("l_id", "user_id", "l_start", "l_end"), "l_start", "l_end",
        rs.toDF("r_id", "k2", "r_start", "r_end")
          .withColumnRenamed("k2", "user_id"), "r_start", "r_end",
        Seq("user_id"), binSeconds = 600L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet
    val expect = (for {
      (li, lk, lsrt, lend) <- ls
      (ri, rk, rsrt, rend) <- rs
      if lk == rk && lsrt.before(rend) && rsrt.before(lend)
    } yield (li, ri)).toSet
    assert(got == expect)
  }

  test("overlapJoin fail-fasts on an interval spanning more bins than the cap") {
    val left = Seq(iv(1L, 1L, "2024-01-01 00:00:00", "2024-03-01 00:00:00"))
      .toDF("l_id", "user_id", "l_start", "l_end")
    val right = Seq(iv(2L, 1L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
      .toDF("r_id", "user_id", "r_start", "r_end")
    val e = intercept[Exception] {
      Temporal.overlapJoin(left, "l_start", "l_end", right, "r_start", "r_end",
        Seq("user_id"), binSeconds = 60L, maxBinsPerInterval = 1000L).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("overlapJoin"))
  }

  test("growthAccounting: new/retained/resurrected/churned ledger with gap days") {
    import graft.operators.Temporal
    // u1: d1, d2, d4  (new, retained, resurrected)
    // u2: d1 only     (new; churns on d2)
    // u3: d2, d4      (new on d2, resurrected on d4)
    // d3 has NO activity: no row, and d4's churn is 0 by the adjacency
    // guard (active(d3) = 0)
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-0$day 10:00:00")
    val events = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(4)),
      (2L, ts(1)),
      (3L, ts(2)), (3L, ts(4)),
      (1L, ts(2))) // same-day duplicate must not double-count
      .toDF("user_id", "ts")
    val got = Temporal.growthAccounting(events, "user_id", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    //                        active new retained resurrected churned net
    assert(got("2024-03-01") == ((2L, 2L, 0L, 0L, 0L, 2L)))
    assert(got("2024-03-02") == ((2L, 1L, 1L, 0L, 1L, 0L)), "u2 churns on d2")
    assert(got("2024-03-04") == ((2L, 0L, 0L, 2L, 0L, 2L)),
      "gap day breaks adjacency: both d4 users resurrect, churn unreported")
    assert(got.size == 3, "no row for the silent day")
    // ledger identity on every row
    got.values.foreach { case (act, nw, ret, res, _, _) =>
      assert(act == nw + ret + res)
    }
  }
  test("nearestEventJoin: prev/next/none/tie semantics, exact us gaps") {
    import TestSpark.spark.implicits._
    def ts(sec: Int) = Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d")
    val ev = Seq(
      // user 1: purchase at :10 and :30; clicks at :12 (prev nearer),
      // :28 (next nearer), :20 (exact tie -> prev, the earlier)
      (1L, ts(10), 1L, "purchase"), (1L, ts(30), 2L, "purchase"),
      (1L, ts(12), 3L, "click"), (1L, ts(28), 4L, "click"),
      (1L, ts(20), 5L, "click"),
      // user 2: click before any purchase -> next; then none for user 3
      (2L, ts(5), 6L, "click"), (2L, ts(9), 7L, "purchase"),
      (3L, ts(1), 8L, "click"),
      // noise type must be ignored entirely
      (1L, ts(13), 9L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.nearestEventJoin(
        ev, "user_id", "ts", "event_id", "event_type", "click", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("direction"),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong))).toMap
    assert(got(3L) == ("prev", Some(2000000L)))   // :12 vs :10/:30
    assert(got(4L) == ("next", Some(2000000L)))   // :28 vs :10/:30
    assert(got(5L) == ("prev", Some(10000000L)))  // exact tie -> earlier
    assert(got(6L) == ("next", Some(4000000L)))   // nothing before
    assert(got(8L) == ("none", None))             // no purchases at all
    assert(!got.contains(9L), "non-left types must not emit rows")
  }
}
