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

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alphabetic runs, single digits, and single
    * non-alphanumeric marks each count as one token. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

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
}
