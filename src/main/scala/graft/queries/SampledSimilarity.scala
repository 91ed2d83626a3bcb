package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Pin, TextDedup, VectorSearch}
import graft.tables.Tables

/** Sampled-pair verification of the similarity family — the sf1-scale
  * oracle gate the full-corpus sweep cannot provide (the families' DuckDB
  * brute-force oracles are pair-QUADRATIC, so `CORRECTNESS_sf1` had to
  * exclude all 16 similarity/ANN queries; their runtime is probed but
  * their ANSWERS above sf0.1 were a blind spot).
  *
  * The scheme: draw a deterministic ~200-doc sample S (smallest 200 by a
  * salted md5 of the id — hex strings order identically in Spark and
  * DuckDB), run the SHIPPED full-corpus pipeline, restrict its output to
  * pairs touching S, and compare against a DuckDB brute force whose outer
  * side is S — sample × corpus is LINEAR in corpus size, so the oracle
  * runs at sf1 (50k docs) in seconds where all-pairs would be 10⁹+.
  * Restricting the OUTPUT (never the pipeline's input) means blocking,
  * banding, prefix filters, and verify all run at true corpus scale; a
  * single pair lost to a broken filter at that scale fails the compare.
  *
  * Cluster queries get EXACT sampled truth from the FULL component
  * structure, built linearly: [[OracleSql.jaccardEdges]] replays the
  * PPJoin prefix filter in SQL to enumerate every verified edge, then
  * [[OracleSql.labelChain]] runs materialized pointer-jumped label
  * rounds (label := label-of-label each round, so 24 rounds cover
  * diameter 2²⁴) — each sampled doc then reads off its true
  * min-reachable label. Per-seed BFS would be quadratic in component
  * size on this near-dup-dense corpus; the label chain is O(E) per
  * round with a fixed round count.
  *
  * These run in the regular sf0.01 driver gate too (cheap there), so the
  * restriction logic itself is hash-verified every round.
  */
object SampledSimilarity {

  private val K = 200
  private val Salt = "samp9:"
  private val Dim = 64

  // ---- shared sample definitions (Spark and SQL must match exactly) ----

  /** Smallest K ids by md5(salt ∥ id) — deterministic, engine-agnostic. */
  private def sampleOf(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol))
      .orderBy(md5(concat(lit(Salt), col(idCol).cast("string"))), col(idCol))
      .limit(K)

  private def sampleDocs(s: SparkSession, dir: String): DataFrame =
    sampleOf(Tables.documents(s, dir), "doc_id")

  /** Keep pairs with either endpoint in the (broadcast-sized) sample. */
  private def touching(pairs: DataFrame, sample: DataFrame, idCol: String,
      aCol: String, bCol: String): DataFrame =
    pairs
      .join(broadcast(sample.select(col(idCol).as("__sa"))),
        col(aCol) === col("__sa"), "left")
      .join(broadcast(sample.select(col(idCol).as("__sb"))),
        col(bCol) === col("__sb"), "left")
      .filter(col("__sa").isNotNull || col("__sb").isNotNull)
      .drop("__sa", "__sb")

  private val sampSql =
    s"""samp AS (
       | SELECT doc_id FROM documents
       | ORDER BY md5('$Salt' || CAST(doc_id AS VARCHAR)), doc_id LIMIT $K)"""
      .stripMargin

  private val toksSql =
    """toks AS (
      | SELECT doc_id, lang,
      |   list_distinct(string_split_regex(lower(text), '\s+')) AS ts
      | FROM documents)""".stripMargin

  private def jac(a: String, b: String) =
    s"len(list_intersect($a, $b))::DOUBLE / " +
      s"(len($a) + len($b) - len(list_intersect($a, $b)))"

  private def dotSql(a: String, b: String) = (0 until Dim)
    .map(i => s"$a[${i + 1}]::DOUBLE * $b[${i + 1}]::DOUBLE").mkString(" + ")
  private def normSql(a: String) = (0 until Dim)
    .map(i => s"$a[${i + 1}]::DOUBLE * $a[${i + 1}]::DOUBLE").mkString(" + ")

  // ---- cluster-truth oracle machinery (q144/q145) -----------------------
  // A naive per-seed BFS oracle is quadratic in component size and the
  // documents corpus is near-dup DENSE (avg verified degree >100 at sf1),
  // so sampled truth needs the FULL component structure — built linearly
  // from [[OracleSql.jaccardEdges]] (the PPJoin prefix filter replayed in
  // SQL; 2.46M verified edges at sf1 in ~7 s) and
  // [[OracleSql.labelChain]] (24 materialized pointer-jumped rounds cover
  // diameter 2^24 — a guarantee for any corpus under ~16M docs, mirroring
  // connectedComponents' loud convergence guard).
  private val ccEdgesSql =
    s"""${OracleSql.jaccardEdges},
       |l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents)"""
      .stripMargin

  private val CcRounds = 24

  private val ccLabelChain: String = OracleSql.labelChain(CcRounds)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q25's word-set Jaccard blocking, full corpus, output ∩ sample
    "q138_sampled_jaccard" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      touching(
          TextDedup.jaccardPairs(docs, "doc_id", "text", Seq("lang"), 0.9),
          sampleDocs(s, dir), "doc_id", "id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    },

    // q53's shingle Jaccard, same treatment
    "q139_sampled_ngram" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      touching(
          TextDedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang"),
            0.8, n = 3),
          sampleDocs(s, dir), "doc_id", "id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    },

    // q27's simhash pigeonhole (md5 hash family), output ∩ sample; the
    // oracle brute-forces hamming over sample × corpus signatures
    "q140_sampled_simhash" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      touching(
          TextDedup.simhashPairs(docs, "doc_id", "text", maxDist = 3,
            tokenHash = TextDedup.md5TokenHash),
          sampleDocs(s, dir), "doc_id", "id_a", "id_b")
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    },

    // q26's md5-affine MinHash+LSH — the full banding pipeline at corpus
    // scale, output ∩ sample; the oracle replays signatures for ALL docs
    // (linear) but probes band buckets only with the sampled reps
    "q141_sampled_minhash" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      touching(
          TextDedup.verifiedMinhashPairsMd5(docs, "doc_id", "text",
            bands = 12, rowsPerBand = 8, threshold = 0.9),
          sampleDocs(s, dir), "doc_id", "id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    },

    // q115's FastSS deletion-neighborhood join, output ∩ sampled suppliers
    "q142_sampled_edit_distance" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir)
      touching(
          TextDedup.editDistancePairs(sup, "s_suppkey", "s_name"),
          sampleOf(sup, "s_suppkey"), "s_suppkey", "id_a", "id_b")
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    },

    // q135's containment decontamination — full benchmark suite against
    // the full corpus, output restricted to sampled bench docs
    "q143_sampled_containment" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sample = sampleOf(docs.filter(col("doc_id") % 20 === 0), "doc_id")
      TextDedup.containmentJoin(
          docs.filter(col("doc_id") % 20 === 0),
          docs.filter(col("doc_id") % 20 =!= 0),
          "doc_id", "text", tau = 0.95)
        .join(broadcast(sample.select(col("doc_id").as("bench_id"))), "bench_id")
        .select(col("bench_id"), col("doc_id"),
          round(col("containment"), 6).as("containment"))
        .transform(Pin(_))
        .orderBy("bench_id", "doc_id")
    },

    // q43's connected components: full pair graph + pointer-jumped CC,
    // labels restricted to the sample; the oracle builds the FULL label
    // structure (jaccardEdges + pointer-jumped labelChain rounds) and
    // reads each sampled doc's true min-reachable id off it
    "q144_sampled_clusters" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val edges = TextDedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang"), 0.9).select("id_a", "id_b")
      TextDedup.connectedComponents(
          docs.select(col("doc_id").as("__id")), edges)
        .join(broadcast(sampleDocs(s, dir)), col("__id") === col("doc_id"))
        .select(col("doc_id"), col("__lbl").as("cluster"))
        .transform(Pin(_))
        .orderBy("doc_id")
    },

    // q96's leakage-safe split, per-doc assignment of the sampled docs —
    // exact because the split is a pure function of the cluster label,
    // which the labelChain oracle reconstructs exactly
    "q145_sampled_split" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = TextDedup.jaccardPairs(docs, "doc_id", "text",
        Seq("lang"), 0.9).select("id_a", "id_b")
      Curation.leakageSafeSplit(docs, "doc_id", pairs, "s96:")
        .join(broadcast(sampleDocs(s, dir)), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("cluster"), col("split"))
        .transform(Pin(_))
        .orderBy("doc_id")
    },

    // q83's incremental (new-vs-base) dedup, output pairs touching S
    "q146_sampled_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      touching(
          TextDedup.jaccardPairsAgainst(
            docs.filter(col("doc_id") % 11 === 0),
            docs.filter(col("doc_id") % 11 =!= 0),
            "doc_id", "text", Seq("lang"), 0.9),
          sampleDocs(s, dir), "doc_id", "new_id", "base_id")
        .select(col("new_id"), col("base_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .transform(Pin(_))
        .orderBy("new_id", "base_id")
    },

    // q47's embedding near-dup (LSH candidates + exact verify) over the
    // planted-dup corpus, output pairs touching 200 sampled vectors
    "q147_sampled_embedding_dedup" -> { (s, dir) =>
      val corpus = TrainingData.nearDupCorpus(s, dir)
      touching(
          VectorSearch.cosineNearDupPairs(corpus, "vec_id", "v", Dim, 0.9),
          sampleOf(corpus, "vec_id"), "vec_id", "id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .transform(Pin(_))
        .orderBy("id_a", "id_b")
    }
  )

  val oracle: Map[String, String] = {
    Map(
      "q138_sampled_jaccard" ->
        s"""WITH $toksSql,
           |$sampSql,
           |st AS (SELECT t.* FROM toks t JOIN samp USING (doc_id)),
           |cand AS (
           | SELECT s.doc_id AS x, t.doc_id AS y, s.ts AS xs, t.ts AS ys
           | FROM st s JOIN toks t ON t.lang = s.lang AND t.doc_id <> s.doc_id),
           |p AS (
           | SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b,
           |  round(${jac("xs", "ys")}, 6) AS jaccard
           | FROM cand WHERE ${jac("xs", "ys")} >= 0.9)
           |SELECT id_a, id_b, jaccard FROM p ORDER BY id_a, id_b""".stripMargin,

      "q139_sampled_ngram" ->
        s"""WITH w AS (
           | SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS w
           | FROM documents),
           |grams AS (
           | SELECT doc_id, lang,
           |  list_distinct(list_transform(generate_series(1, len(w) - 2),
           |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ts
           | FROM w WHERE len(w) >= 3),
           |$sampSql,
           |st AS (SELECT g.* FROM grams g JOIN samp USING (doc_id)),
           |cand AS (
           | SELECT s.doc_id AS x, t.doc_id AS y, s.ts AS xs, t.ts AS ys
           | FROM st s JOIN grams t ON t.lang = s.lang AND t.doc_id <> s.doc_id),
           |p AS (
           | SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b,
           |  round(${jac("xs", "ys")}, 6) AS jaccard
           | FROM cand WHERE ${jac("xs", "ys")} >= 0.8)
           |SELECT id_a, id_b, jaccard FROM p ORDER BY id_a, id_b""".stripMargin,

      "q140_sampled_simhash" ->
        s"""WITH tk AS (
           | SELECT doc_id,
           |  unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok
           | FROM documents),
           |bits AS (
           | SELECT doc_id, b.b,
           |  sum(CASE WHEN ((md5_number_lower(tok) >> b.b) & 1) = 1
           |      THEN 1 ELSE -1 END) AS s
           | FROM tk CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
           | GROUP BY 1, 2),
           |sigs AS (
           | SELECT doc_id,
           |  CAST(sum(CASE WHEN b = 63 OR s <= 0 THEN 0
           |           ELSE (1::BIGINT << CAST(b AS INT)) END) AS BIGINT)
           |  + CASE WHEN max(CASE WHEN b = 63 AND s > 0 THEN 1 ELSE 0 END) = 1
           |         THEN -9223372036854775808 ELSE 0 END AS sig
           | FROM bits GROUP BY doc_id),
           |$sampSql,
           |ss AS (SELECT g.* FROM sigs g JOIN samp USING (doc_id)),
           |p AS (
           | SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
           |  greatest(a.doc_id, b.doc_id) AS id_b,
           |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
           | FROM ss a JOIN sigs b ON a.doc_id <> b.doc_id
           | WHERE bit_count(xor(a.sig, b.sig)) <= 3)
           |SELECT id_a, id_b, hamming FROM p ORDER BY id_a, id_b""".stripMargin,

      // q26's banding replay with the bucket probe restricted to sampled
      // reps: signatures stay full-corpus (linear), candidates/verify are
      // sample-sided, member expansion filters to pairs touching S
      "q141_sampled_minhash" ->
        s"""WITH d AS (SELECT doc_id, text, md5(text) AS ch FROM documents),
           |$sampSql,
           |reps AS (SELECT ch, min(doc_id) AS rep FROM d GROUP BY ch),
           |mem AS (SELECT d.doc_id, r.rep FROM d JOIN reps r ON d.ch = r.ch),
           |rd AS (SELECT d.doc_id AS id, d.text FROM d
           |       JOIN reps r ON d.doc_id = r.rep),
           |tk AS (SELECT id,
           |  unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok
           | FROM rd),
           |tm AS (SELECT id,
           |  CASE WHEN r0 >= 2305843009213693951
           |       THEN r0 - 2305843009213693951 ELSE r0 END AS x
           | FROM (SELECT id,
           |   CAST(m & 2305843009213693951::UBIGINT AS BIGINT)
           |   + CAST(m >> 61 AS BIGINT) AS r0
           |  FROM (SELECT id, md5_number_lower(tok) AS m FROM tk))),
           |perms AS (SELECT p,
           |  (CAST(md5_number_lower('a|' || p) & 2147483647::UBIGINT AS BIGINT)
           |    | 1) AS ap,
           |  CAST(md5_number_lower('b|' || p) & 1152921504606846975::UBIGINT
           |    AS BIGINT) AS bp
           | FROM (SELECT unnest(range(0, 96)) AS p)),
           |hp AS (SELECT id, p,
           |  CASE WHEN s1 >= 2305843009213693951
           |       THEN s1 - 2305843009213693951 ELSE s1 END AS h
           | FROM (SELECT id, p,
           |   CASE WHEN s0 >= 2305843009213693951
           |        THEN s0 - 2305843009213693951 ELSE s0 END AS s1
           |  FROM (SELECT id, p, t + v + bp AS s0
           |   FROM (SELECT id, p, bp,
           |     CASE WHEN t0 >= 2305843009213693951
           |          THEN t0 - 2305843009213693951 ELSE t0 END AS t,
           |     CASE WHEN v0 >= 2305843009213693951
           |          THEN v0 - 2305843009213693951 ELSE v0 END AS v
           |    FROM (SELECT id, p, bp,
           |      (((u & 1073741823) << 31) + (u >> 30)) AS t0,
           |      ((w & 2305843009213693951) + (w >> 61)) AS v0
           |     FROM (SELECT id, p, bp,
           |       ap * (x >> 31) AS u,
           |       ap * (x & 2147483647) AS w
           |      FROM tm CROSS JOIN perms)))))),
           |hm AS (SELECT id, p, min(h) AS h FROM hp GROUP BY 1, 2),
           |bk AS (SELECT id, CAST(p // 8 AS INT) AS band,
           |        string_agg(h::VARCHAR, ',' ORDER BY p) AS key
           |       FROM hm GROUP BY 1, 2),
           |sreps AS (SELECT DISTINCT m.rep FROM mem m
           |          JOIN samp s ON m.doc_id = s.doc_id),
           |bks AS (SELECT b.* FROM bk b JOIN sreps r ON b.id = r.rep),
           |cand AS (SELECT DISTINCT least(x.id, y.id) AS ra,
           |          greatest(x.id, y.id) AS rb
           |         FROM bks x JOIN bk y
           |           ON x.band = y.band AND x.key = y.key AND x.id <> y.id),
           |ts AS (SELECT id,
           |  list_distinct(string_split_regex(lower(text), '\\s+')) AS s
           | FROM rd),
           |vp AS (SELECT c.ra, c.rb, ${jac("a.s", "b.s")} AS j
           |       FROM cand c JOIN ts a ON c.ra = a.id JOIN ts b ON c.rb = b.id
           |       WHERE ${jac("a.s", "b.s")} >= 0.9),
           |allp AS (
           | SELECT least(ma.doc_id, mb.doc_id) AS id_a,
           |        greatest(ma.doc_id, mb.doc_id) AS id_b,
           |        round(j, 6) AS jaccard
           | FROM vp JOIN mem ma ON vp.ra = ma.rep JOIN mem mb ON vp.rb = mb.rep
           | UNION ALL
           | SELECT DISTINCT least(x.doc_id, y.doc_id), greatest(x.doc_id, y.doc_id), 1.0
           | FROM mem x JOIN samp s ON x.doc_id = s.doc_id
           | JOIN mem y ON x.rep = y.rep AND x.doc_id <> y.doc_id)
           |SELECT id_a, id_b, jaccard FROM allp
           |WHERE id_a IN (SELECT doc_id FROM samp)
           |   OR id_b IN (SELECT doc_id FROM samp)
           |ORDER BY id_a, id_b""".stripMargin,

      "q142_sampled_edit_distance" ->
        s"""WITH samp AS (
           | SELECT s_suppkey, s_name FROM supplier
           | ORDER BY md5('$Salt' || CAST(s_suppkey AS VARCHAR)), s_suppkey
           | LIMIT $K)
           |SELECT DISTINCT least(a.s_suppkey, b.s_suppkey) AS id_a,
           | greatest(a.s_suppkey, b.s_suppkey) AS id_b,
           | CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
           |FROM samp a JOIN supplier b
           | ON a.s_suppkey <> b.s_suppkey
           |  AND levenshtein(a.s_name, b.s_name) <= 1
           |ORDER BY id_a, id_b""".stripMargin,

      "q143_sampled_containment" ->
        s"""WITH d AS (
           | SELECT doc_id,
           |  list_distinct(string_split_regex(lower(text), '\\s+')) AS ts
           | FROM documents),
           |samp AS (
           | SELECT doc_id FROM documents WHERE doc_id % 20 = 0
           | ORDER BY md5('$Salt' || CAST(doc_id AS VARCHAR)), doc_id LIMIT $K),
           |b AS (SELECT d.doc_id AS bench_id, ts AS bts FROM d
           |      JOIN samp s ON d.doc_id = s.doc_id),
           |c AS (SELECT doc_id, ts AS cts FROM d WHERE doc_id % 20 <> 0)
           |SELECT bench_id, doc_id,
           | round(len(list_intersect(bts, cts))::DOUBLE / len(bts), 6)
           |   AS containment
           |FROM b JOIN c
           | ON len(list_intersect(bts, cts))::DOUBLE / len(bts) >= 0.95
           |ORDER BY bench_id, doc_id""".stripMargin,

      "q144_sampled_clusters" ->
        s"""WITH $ccEdgesSql,
           |$ccLabelChain,
           |$sampSql
           |SELECT s.doc_id, l.lbl AS cluster
           |FROM samp s JOIN l$CcRounds l ON l.id = s.doc_id
           |ORDER BY s.doc_id""".stripMargin,

      "q145_sampled_split" ->
        s"""WITH $ccEdgesSql,
           |$ccLabelChain,
           |$sampSql
           |SELECT s.doc_id, l.lbl AS cluster,
           | CASE WHEN substr(md5('s96:' || l.lbl), 1, 4) < 'cccc'
           |       THEN 'train'
           |      WHEN substr(md5('s96:' || l.lbl), 1, 4) < 'e666'
           |       THEN 'val'
           |      ELSE 'test' END AS split
           |FROM samp s JOIN l$CcRounds l ON l.id = s.doc_id
           |ORDER BY s.doc_id""".stripMargin,

      "q146_sampled_incremental" ->
        s"""WITH $toksSql,
           |$sampSql,
           |n AS (SELECT * FROM toks WHERE doc_id % 11 = 0),
           |b AS (SELECT * FROM toks WHERE doc_id % 11 <> 0),
           |sn AS (SELECT n.* FROM n JOIN samp USING (doc_id)),
           |sb AS (SELECT b.* FROM b JOIN samp USING (doc_id)),
           |cand AS (
           | SELECT n.doc_id AS new_id, b.doc_id AS base_id,
           |        n.ts AS ns, b.ts AS bs
           | FROM sn n JOIN b ON b.lang = n.lang
           | UNION
           | SELECT n.doc_id, b.doc_id, n.ts, b.ts
           | FROM n JOIN sb b ON b.lang = n.lang)
           |SELECT new_id, base_id, round(${jac("ns", "bs")}, 6) AS jaccard
           |FROM cand WHERE ${jac("ns", "bs")} >= 0.9
           |ORDER BY new_id, base_id""".stripMargin,

      "q147_sampled_embedding_dedup" -> {
        val dotAB = dotSql("a.v", "b.v")
        val nA = normSql("a.v")
        val nB = normSql("b.v")
        s"""WITH base AS (
           | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |dups AS (
           | SELECT vec_id + 1000000 AS vec_id,
           |   list_transform(v, x -> x * 1.02 + 0.01) AS v
           | FROM base WHERE vec_id % 20 = 0),
           |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
           |samp AS (
           | SELECT vec_id FROM corpus
           | ORDER BY md5('$Salt' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $K),
           |sc AS (SELECT c.* FROM corpus c JOIN samp USING (vec_id)),
           |p AS (
           | SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
           |  greatest(a.vec_id, b.vec_id) AS id_b,
           |  round(($dotAB) / (sqrt($nA) * sqrt($nB)), 6) AS cosine
           | FROM sc a JOIN corpus b ON a.vec_id <> b.vec_id
           | WHERE ($dotAB) / (sqrt($nA) * sqrt($nB)) >= 0.9)
           |SELECT id_a, id_b, cosine FROM p ORDER BY id_a, id_b""".stripMargin
      }
    )
  }
}
