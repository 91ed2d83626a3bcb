package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-hit heuristic), quality scoring (length/punctuation/stopword
  * ratios), token counting (whitespace + BPE-ish regex), and document
  * fingerprinting (rolling char-k-gram hashes).
  *
  * Everything composes codegen'd built-ins; every function is also
  * expressible in ANSI SQL, which is what the DuckDB oracles replay.
  */
object TextAnalysis {

  /** Small per-language stopword lists (ASCII, whitespace-tokenizable).
    * Order matters: argmax ties resolve to the earlier language. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "con", "para", "del", "más"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这")
  )

  private def toks(text: Column): Column =
    array_distinct(split(lower(text), "\\s+"))

  /** Distinct-token hits against one language's stopword list. */
  def stopwordHits(text: Column, lang: String): Column = {
    val list = stopwords.toMap.apply(lang)
    size(array_intersect(toks(text), array(list.map(lit): _*)))
  }

  /** Heuristic language ID: argmax of stopword hits, first-listed language
    * wins ties; no hits at all → 'und' (undetermined). */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> stopwordHits(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), rest) =>
      when(s === best && best > 0, lit(l)).otherwise(rest)
    }
  }

  /** Whitespace token count (long — see [[tokenCountBpe]]'s dtype note). */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token count: alphabetic runs, single digits, and single
    * non-alphanumeric marks each count as one token. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    // long, not int: token counts are BIGINT-shaped everywhere downstream
    // (DuckDB len() is BIGINT; corpus-scale sums overflow int32)
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** English-stopword share of distinct tokens — a crude fluency signal. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") /
      greatest(size(toks(text)), lit(1)).cast("double")

  /** Mean whitespace-token length. */
  def meanWordLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCountWs(text), lit(1)).cast("double"))

  /** Composite quality score in [0,1]: rewards stopword presence and sane
    * word lengths, penalizes punctuation soup. Formula is deterministic
    * double arithmetic (oracle-replayable). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val sw = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punct = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(10.0))
    val wl = meanWordLen(text)
    val wlScore = when(wl >= 3.0 && wl <= 10.0, lit(1.0)).otherwise(lit(0.5))
    lenScore * lit(0.25) + sw * lit(0.25) + punct * lit(0.25) + wlScore * lit(0.25)
  }

  /** Document fingerprint: the `keep` smallest 64-bit hashes over the
    * character `k`-gram shingles (winnowing-style min-sketch). Two documents
    * sharing most of their character stream share most fingerprint entries.
    */
  def fingerprint(text: Column, k: Int = 8, keep: Int = 4): Column =
    // one codegen'd pass; bit-identical to the former
    // slice(array_sort(transform(sequence…, xxhash64(substr))), 1, keep)
    graft.functions.RollingFingerprint(text, k, keep)

  // ------------------------------------- repetition signals (Gopher-style) --
  // "Scaling Language Models" (Rae et al. 2021) §A1.1 filters training docs
  // on repetition: duplicate-word share, most-frequent-n-gram char share,
  // duplicate-n-gram share. Each is a per-row fold over the document's own
  // token array — no explode, no shuffle, whole-stage codegen — so at 100 TB
  // the signals cost exactly one scan.

  /** Whitespace word array, lowercased, order preserved (with repeats). */
  /** Ordered lowercase word array (duplicates kept, text trimmed so
    * padding never yields empty-string tokens) — the shared tokenization
    * for order-sensitive text ops ([[wordNgrams]], [[LanguageModel]]). */
  def wordArr(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Evaluate `e` ONCE per row and hand the value to `f` as a bound lambda
    * variable. Sub-expressions referenced many times inside higher-order
    * lambdas are otherwise re-evaluated per call (HOFs run interpreted, so
    * a `split()` referenced from `n` `element_at`s re-splits — and
    * re-compiles its regex — `n` times per row; binding it cut the n-gram
    * tree ~6×). */
  private def bind1(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Order-preserving word `n`-grams (space-joined, repeats kept); empty
    * array when the document has fewer than `n` words. */
  def wordNgrams(text: Column, n: Int): Column =
    bind1(wordArr(text)) { ws =>
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Share of word occurrences that repeat an earlier word:
    * `(n_words - n_distinct) / n_words`. */
  def dupWordFrac(text: Column): Column =
    bind1(wordArr(text)) { ws =>
      (size(ws) - size(array_distinct(ws))).cast("double") /
        greatest(size(ws), lit(1)).cast("double")
    }

  /** Share of word-`n`-gram occurrences that repeat an earlier gram. */
  def dupNgramFrac(text: Column, n: Int): Column =
    bind1(wordNgrams(text, n)) { gs =>
      (size(gs) - size(array_distinct(gs))).cast("double") /
        greatest(size(gs), lit(1)).cast("double")
    }

  /** `struct(gram, n)` of the document's most frequent word `n`-gram; ties
    * resolve to the lexicographically smallest gram, and a doc with no
    * grams yields `('', 0)`. One run-length scan over the sorted gram array
    * (sorting makes equal grams adjacent), so the cost is O(grams log grams)
    * per row with zero data movement — the oracle replays it as the
    * conventional explode + count + row_number pipeline. */
  def topNgram(text: Column, n: Int): Column = {
    val sorted = array_sort(wordNgrams(text, n))
    val init = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit("").as("best_gram"))
    val folded = aggregate(sorted, init, (acc, g) => {
      val run = when(g === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
      struct(g.as("prev"), run.as("run"),
        when(run > acc("best"), run).otherwise(acc("best")).as("best"),
        when(run > acc("best"), g).otherwise(acc("best_gram")).as("best_gram"))
    })
    struct(folded("best_gram").as("gram"), folded("best").as("n"))
  }

  /** Characters covered by the most frequent word `n`-gram as a share of
    * the raw document length (the gram's internal spaces count, its copies
    * are assumed non-overlapping — Gopher's convention). */
  def topNgramCharFrac(text: Column, n: Int): Column =
    bind1(topNgram(text, n)) { t =>
      (t("n") * length(t("gram"))).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    }

  /** Exact corpus heavy hitters (tokens with count ≥ minShare·N) via the
    * classic two-pass sketch-then-verify shape:
    *
    *  1. candidate pass — a Misra–Gries sketch ([[graft.functions.MisraGries]])
    *     aggregated over all tokens. Any token with true share
    *     > 1/(sketchSize+1) is guaranteed present, so for
    *     minShare > 1/(sketchSize+1) (enforced) the sketch keys are a
    *     SUPERSET of the answer. Shuffle: ≤sketchSize counters per task —
    *     never the token stream, never the long tail.
    *  2. verify pass — exact counts of just the candidates: tokens
    *     broadcast-semi-join the ≤sketchSize candidate keys BEFORE the
    *     aggregation, so only heavy-candidate occurrences reach the
    *     shuffle. Output is exact (counts and membership), not approximate.
    *
    * The corpus total N rides the sketch pass as a plain COUNT, so the
    * whole operator is two scans and two k-bounded shuffles — the shape
    * that survives a 100 TB corpus with a vocabulary that doesn't fit
    * anywhere. */
  def heavyHitters(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minShare: Double, sketchSize: Int = 256): org.apache.spark.sql.DataFrame = {
    require(minShare > 1.0 / (sketchSize + 1),
      s"minShare $minShare must exceed 1/(sketchSize+1) or the sketch " +
        "cannot guarantee candidate recall")
    val toks = docs.select(explode(wordArr(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val sketch = toks.agg(
      graft.functions.MisraGries.misra_gries(col("token"), sketchSize).as("sk"),
      count(lit(1)).as("__N"))
    val cands = sketch.select(explode(map_keys(col("sk"))).as("token"),
      col("__N"))
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token"), col("__N"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(lit(minShare) * col("__N").cast("double")))
      .select(col("token"), col("cnt"))
  }
}
