package graft.queries

/** Shared DuckDB-oracle SQL building blocks for the near-dup family at
  * SCALE — the pieces that turn pair-quadratic brute force into linear
  * plans the sf1 sweep can actually run:
  *
  *  - [[jaccardEdges]]: the FULL verified J≥0.9 edge set over `documents`
  *    via the pipeline's own PPJoin prefix filter replayed in SQL —
  *    complete by the prefix-filter theorem (any pair with J ≥ τ shares a
  *    token inside both docs' first |T|−⌈τ|T|⌉+1 tokens under one global
  *    (df, token) order), with md5-hashed sorted UBIGINT token lists
  *    (string list_intersect measures ~10× slower) and the τ-implied
  *    length-ratio filter in the candidate join. 2.46M verified edges at
  *    sf1 in ~7 s.
  *  - [[labelChain]]: min-label propagation as UNROLLED, MATERIALIZED
  *    pointer-jumped rounds (hop + lbl := lbl(lbl)); `rounds` rounds reach
  *    diameter 2^rounds. AS MATERIALIZED is load-bearing — each round CTE
  *    is referenced twice, and DuckDB inlines (re-evaluates) plain CTEs,
  *    which would be exponential in rounds.
  *  - [[eliminationChain]]: the greedy min-id survivor set (sequential
  *    "keep unless it near-dups an earlier keeper") as UNROLLED iterated
  *    elimination — s_k = paired ∖ {hi : (lo,hi) edge, lo ∈ s_{k−1}} —
  *    whose fixpoint IS the sequential set; a final fixpoint check feeds a
  *    poison row so an unconverged unroll fails the compare LOUDLY instead
  *    of silently blessing a wrong survivor set (mirroring
  *    greedySurvivors' own maxIter guard). The one-row-per-step recursive
  *    CTE this replaces is O(n) sequential steps — hours at sf1.
  */
private[queries] object OracleSql {

  /** md5-hashed sorted distinct word-token sets as `hts (doc_id, lang,
    * hs, n)` — the set frame every edge build starts from. */
  val wordSets: String =
    """hts AS MATERIALIZED (
      | SELECT doc_id, lang,
      |   list_sort(list_transform(
      |     list_distinct(string_split_regex(lower(text), '\s+')),
      |     x -> md5_number_lower(x))) AS hs,
      |   len(list_distinct(string_split_regex(lower(text), '\s+'))) AS n
      | FROM documents)""".stripMargin

  /** Word-trigram (shingle) variant of [[wordSets]] — docs under 3 words
    * carry no shingles and pair with nothing, like the pipeline. */
  val ngramSets: String =
    """hts AS MATERIALIZED (
      | WITH w AS (
      |  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents)
      | SELECT doc_id, lang,
      |  list_sort(list_distinct(list_transform(
      |    generate_series(1, len(w) - 2),
      |    i -> md5_number_lower(w[i] || ' ' || w[i+1] || ' ' || w[i+2])))) AS hs,
      |  len(list_distinct(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS n
      | FROM w WHERE len(w) >= 3)""".stripMargin

  /** CTE block `tokh, dfreq, pref, epairs, edges` downstream of a set CTE
    * named `hts` — epairs holds each verified pair once with `x < y`;
    * edges is the directed doubling. */
  def edgesFromSets(tau: Double): String =
    s"""tokh AS MATERIALIZED (
       | SELECT doc_id, lang, n, unnest(hs) AS t FROM hts),
       |dfreq AS MATERIALIZED (
       | SELECT lang, t, count(*) AS df FROM tokh GROUP BY 1, 2),
       |pref AS MATERIALIZED (
       | SELECT doc_id, lang, n, t FROM (
       |  SELECT k.doc_id, k.lang, k.t, k.n,
       |    row_number() OVER (PARTITION BY k.doc_id ORDER BY d.df, k.t) AS rk
       |  FROM tokh k JOIN dfreq d ON d.lang = k.lang AND d.t = k.t)
       | WHERE rk <= n - CAST(ceil($tau * n) AS BIGINT) + 1),
       |epairs AS MATERIALIZED (
       | WITH cand AS (
       |  SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
       |  FROM pref a JOIN pref b ON a.lang = b.lang AND a.t = b.t
       |   AND a.doc_id < b.doc_id
       |   AND b.n >= CAST(ceil($tau * a.n) AS BIGINT)
       |   AND b.n <= CAST(floor(a.n / $tau) AS BIGINT))
       | SELECT c.x, c.y
       | FROM cand c JOIN hts a ON a.doc_id = c.x JOIN hts b ON b.doc_id = c.y
       | WHERE len(list_intersect(a.hs, b.hs))::DOUBLE /
       |   (a.n + b.n - len(list_intersect(a.hs, b.hs))) >= $tau),
       |edges AS MATERIALIZED (
       | SELECT x AS src, y AS dst FROM epairs
       | UNION ALL SELECT y, x FROM epairs)""".stripMargin

  /** The word-set J≥0.9 edge block (the q25/q43/q96/q126 pair graph). */
  val jaccardEdges: String = s"$wordSets,\n${edgesFromSets(0.9)}"

  /** Exact jaccard of a verified pair frame `p (x, y)`, re-joined to hts. */
  def pairScore(p: String): String =
    s"""SELECT $p.x, $p.y,
       | round(len(list_intersect(a.hs, b.hs))::DOUBLE /
       |   (a.n + b.n - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
       |FROM $p JOIN hts a ON a.doc_id = $p.x JOIN hts b ON b.doc_id = $p.y"""
      .stripMargin

  /** Pointer-jumped min-label rounds `l1..l<rounds>` from a seed CTE `l0`
    * (columns `id, lbl`) over `edges (src, dst)`. */
  def labelChain(rounds: Int): String = (1 to rounds).map { k =>
    val prev = if (k == 1) "l0" else s"l${k - 1}"
    s"""h$k AS MATERIALIZED (
       | SELECT e.dst AS id, min(l.lbl) AS m
       | FROM $prev l JOIN edges e ON e.src = l.id GROUP BY e.dst),
       |m$k AS MATERIALIZED (
       | SELECT l.id, least(l.lbl, coalesce(h.m, l.lbl)) AS lbl
       | FROM $prev l LEFT JOIN h$k h ON h.id = l.id),
       |l$k AS MATERIALIZED (
       | SELECT a.id, b.lbl FROM m$k a JOIN m$k b ON a.lbl = b.id)"""
      .stripMargin
  }.mkString(",\n")

  /** Iterated-elimination rounds `s0..s<rounds>` over `epairs (x, y)` plus
    * an `unconv` fixpoint check (n > 0 ⇔ the last two rounds differ). */
  def eliminationChain(rounds: Int): String = {
    val base =
      """paired AS MATERIALIZED (
        | SELECT DISTINCT x AS id FROM epairs
        | UNION SELECT DISTINCT y FROM epairs),
        |s0 AS MATERIALIZED (SELECT id FROM paired)""".stripMargin
    val steps = (1 to rounds).map { k =>
      s"""b$k AS MATERIALIZED (
         | SELECT DISTINCT e.y AS id FROM epairs e
         | JOIN s${k - 1} s ON e.x = s.id),
         |s$k AS MATERIALIZED (
         | SELECT id FROM paired EXCEPT SELECT id FROM b$k)""".stripMargin
    }.mkString(",\n")
    val check =
      s"""unconv AS (
         | SELECT count(*) AS n FROM (
         |  (SELECT id FROM s$rounds EXCEPT SELECT id FROM s${rounds - 1})
         |  UNION ALL
         |  (SELECT id FROM s${rounds - 1} EXCEPT SELECT id FROM s$rounds)))"""
        .stripMargin
    s"$base,\n$steps,\n$check"
  }
}
