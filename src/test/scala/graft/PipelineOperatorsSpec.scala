package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, LanguageModel}

/** Unit pins for the beyond-reference pipeline operators: as-of join
  * semantics (latest right row at-or-before each left row, per key, with
  * atomic null handling), conversion-funnel ordering/window rules, BM25
  * ranking properties, the Naive Bayes classifier on a separable corpus,
  * and hand-computed bigram-LM surprisal values. */
class PipelineOperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: latest at-or-before per key, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", "2024-01-01 10:00:00"),
      (2L, "u1", "2024-01-01 12:00:00"),
      (3L, "u1", "2024-01-01 09:00:00"), // before every right row -> null
      (4L, "u2", "2024-01-01 11:00:00"), // equal ts -> inclusive match
      (5L, "u3", "2024-01-01 11:00:00")  // key with no right rows -> null
    ).toDF("event_id", "key", "t")
      .select(col("event_id"), col("key"), col("t").cast("timestamp").as("ts"))
    val right = Seq(
      ("u1", "2024-01-01 09:30:00", 1.0),
      ("u1", "2024-01-01 11:30:00", 2.0),
      ("u2", "2024-01-01 11:00:00", 3.0)
    ).toDF("key", "t", "state")
      .select(col("key"), col("t").cast("timestamp").as("ts"), col("state"))

    val out = AsOfJoin.asOf(left, right, Seq("key"), "ts",
        rightTsAs = Some("state_ts"))
      .select("event_id", "state", "state_ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap

    assert(out(1L) === (Some(1.0), Some(ts("2024-01-01 09:30:00"))))
    assert(out(2L) === (Some(2.0), Some(ts("2024-01-01 11:30:00"))))
    assert(out(3L) === (None, None))
    assert(out(4L) === (Some(3.0), Some(ts("2024-01-01 11:00:00"))))
    assert(out(5L) === (None, None))
  }

  test("asOf: null payload carries atomically; null-ts right rows never match") {
    import spark.implicits._
    val left = Seq((1L, "k", "2024-01-01 12:00:00"))
      .toDF("event_id", "key", "t")
      .select(col("event_id"), col("key"), col("t").cast("timestamp").as("ts"))
    val right = Seq(
      ("k", Some("2024-01-01 10:00:00"), Some(5.0)),
      ("k", Some("2024-01-01 11:00:00"), None), // latest match, NULL payload
      ("k", None, Some(7.0)) // null ts: must match nothing
    ).toDF("key", "t", "state")
      .select(col("key"), col("t").cast("timestamp").as("ts"), col("state"))
    val out = AsOfJoin.asOf(left, right, Seq("key"), "ts",
        rightTsAs = Some("state_ts"))
      .select("state", "state_ts").collect().head
    // the matched row is 11:00 with a genuinely NULL state — per-column
    // carry-forward would instead leak 10:00's 5.0 (or null-ts's 7.0)
    assert(out.isNullAt(0), s"expected NULL state, got ${out.get(0)}")
    assert(out.getTimestamp(1) === ts("2024-01-01 11:00:00"))
  }

  test("asOf rejects ambiguous payload column names") {
    import spark.implicits._
    val l = Seq((1L, "k", "2024-01-01 00:00:00", 1.0)).toDF("id", "key", "t", "v")
      .select(col("id"), col("key"), col("t").cast("timestamp").as("ts"), col("v"))
    val r = Seq(("k", "2024-01-01 00:00:00", 2.0)).toDF("key", "t", "v")
      .select(col("key"), col("t").cast("timestamp").as("ts"), col("v"))
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("key"), "ts")
    }
  }

  test("bm25TopK: hit-count cap, absent terms score nothing, idf favors rarity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark"), // tf=3 on a common term
      (2L, "spark shuffle"),     // one common + one rare term
      (3L, "spark"),
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Retrieval
      .bm25TopK(docs, "doc_id", "text", Seq("spark", "shuffle"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(4L), "doc without any query term must not appear")
    assert(out(2L)._1 == 2L && out(1L)._1 == 1L)
    // 'shuffle' (df=1) is rarer than 'spark' (df=3): the two-term doc must
    // outrank any tf pile-up on the common term
    assert(out(2L)._2 > out(1L)._2,
      s"rare-term doc must outrank common-term repetition: $out")
  }

  test("funnel: step order enforced, window expiry breaks the chain") {
    import spark.implicits._
    val ev = Seq(
      // u1: full in-order funnel inside the window
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 11:00:00", "click"),
      ("u1", "2024-01-01 12:00:00", "buy"),
      // u2: click BEFORE the first view — step 2 must not count it
      ("u2", "2024-01-01 09:00:00", "click"),
      ("u2", "2024-01-01 10:00:00", "view"),
      ("u2", "2024-01-01 10:30:00", "buy"), // buy before any valid click
      // u3: click lands after the 2h window from the first view
      ("u3", "2024-01-01 10:00:00", "view"),
      ("u3", "2024-01-01 13:00:00", "click"),
      // u4: never viewed -> not in the funnel at all
      ("u4", "2024-01-01 10:00:00", "click")
    ).toDF("user", "t", "typ")
      .select(col("user"), col("t").cast("timestamp").as("ts"), col("typ"))
    val out = graft.operators.Funnel
      .funnel(ev, "user", "ts", "typ", Seq("view", "click", "buy"), "2 HOUR")
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out.keySet == Set("u1", "u2", "u3"), s"got ${out.keySet}")
    assert(out("u1") == (false, false), "u1 completes all steps")
    assert(out("u2") == (true, true), "u2's pre-view click must not count")
    assert(out("u3") == (true, true), "u3's click is outside the window")
  }

  test("naiveBayes separates a cleanly separable corpus and reports truth") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb aa", "x"), (2L, "aa bb", "x"), (3L, "bb aa aa", "x"),
      (4L, "cc dd cc", "y"), (5L, "dd cc", "y"), (6L, "cc dd dd", "y")
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.LanguageModel
      .naiveBayes(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.size == 6)
    out.foreach { case (id, (truth, pred)) =>
      assert(pred == truth, s"doc $id: predicted $pred, truth $truth")
    }
  }

  test("bigramSurprisal matches hand-computed add-one-smoothed values") {
    import spark.implicits._
    // corpus: doc1 "a b a", doc2 "b a", doc3 "solo"
    // unigrams a:3 b:2 solo:1 -> V=3; bigrams "a b":1, "b a":2
    // nll(a b) = -log2((1+1)/(3+3)) = log2(3)
    // nll(b a) = -log2((2+1)/(2+3)) = log2(5/3)
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nllAB = math.log(3.0) / math.log(2)
    val nllBA = math.log(5.0 / 3.0) / math.log(2)
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 - (nllAB + nllBA) / 2) < 1e-12)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - nllBA) < 1e-12)
    // single-token doc has no bigrams -> absent
    assert(!out.contains(3L))
  }

  test("dsirWeights: target-like docs outrank off-target; counts = uni+bi grams") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // target-like
      (2L, "gamma delta gamma delta epsilon"), // off-target
      (3L, "alpha beta gamma") // mixed
    ).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha"), (11L, "beta alpha beta"))
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_features = words + bigrams: 4+3, 5+4, 3+2
    assert(out(1L)._1 == 7L && out(2L)._1 == 9L && out(3L)._1 == 5L)
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      s"expected target-like > mixed > off-target, got $out")
  }

  test("exactSubstrRemove cuts cross-doc spans, keeps unique text, merges overlaps") {
    import spark.implicits._
    // license block "l1..l6" shared by docs 1/2 (overlapping 5-grams merge
    // into one 6-word span); doc 3 is fully unique; doc 4 IS the block
    val docs = Seq(
      (1L, "u1 u2 l1 l2 l3 l4 l5 l6 u3"),
      (2L, "v1 l1 l2 l3 l4 l5 l6"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      (4L, "l1 l2 l3 l4 l5 l6")
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation.exactSubstrRemove(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((9L, 6L, "u1 u2 u3")))
    assert(out(2L) == ((7L, 6L, "v1")))
    assert(out(3L) == ((7L, 0L, "w1 w2 w3 w4 w5 w6 w7")))
    assert(out(4L) == ((6L, 6L, ""))) // fully covered -> empty remainder
  }
}
