package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: cross-document
  * contamination stats, deterministic stratified sampling, and per-group
  * caps. These are the selection/weighting steps that sit between dedup
  * and tokenization in a production pipeline (C4, RefinedWeb, Gopher all
  * describe variants).
  *
  * Everything here is deterministic and replayable in ANSI SQL, so every
  * operator carries a DuckDB oracle; nothing touches the driver beyond
  * plan construction.
  */
object Curation {

  /** Per-document cross-corpus duplication stats: how many of a document's
    * distinct word `n`-grams occur in at least `minDocs` documents
    * corpus-wide (the RefinedWeb/CCNet "duplicated span" signal, and the
    * standard eval-contamination check with `minDocs = 2` against a
    * benchmark corpus).
    *
    * Shape at scale: one explode of per-doc distinct grams, one gram-keyed
    * count, and one equi-join back on the gram — both shuffle legs hash on
    * the gram so the join is co-partitioned with the count it consumes.
    * Only (gram, id) pairs ever move; document payloads stay in place. At
    * 100 TB you would additionally shuffle `xxhash64(gram)` instead of the
    * gram text to cut shuffle bytes ~4× (collision odds ~n²/2⁶⁴); kept as
    * the raw string here so the DuckDB oracle replays exactly.
    */
  def crossDocNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    val distinctGrams = array_distinct(TextAnalysis.wordNgrams(col(textCol), n))
    val grams = df.select(col(idCol), explode(distinctGrams).as("gram"))
    val shared = grams.groupBy("gram")
      .agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") >= minDocs)
      .select(col("gram"), lit(1).as("hit"))
    // one pass computes both counters: every probe row counts toward
    // n_grams, matched rows (left-join hit) toward n_shared — the gram
    // tree is evaluated exactly twice (build leg, probe leg) and document
    // payloads never shuffle, only (id, gram) pairs
    val perDoc = grams.join(shared, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_shared"))
    // docs too short to have any gram re-enter via an id-only scan
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1)).cast("double"), 6)
          .as("shared_frac"))
  }

  /** Cross-document EXACT-SUBSTRING span removal — the ExactSubstr dedup
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022), at word granularity: every word position covered
    * by an `n`-gram that also occurs in ANOTHER document is deleted, and
    * the surviving words re-join in order. Unlike document-level dedup
    * this strips boilerplate, licenses, and template blocks embedded in
    * otherwise-unique documents while keeping the unique remainder.
    * Within-doc repeats are deliberately NOT spans here (cross-doc
    * occurrence is the signal; the repetition operators in TextAnalysis
    * cover intra-doc duplication).
    *
    * Scale shape: only (id, position, word) and (id, gram-start) pairs
    * ever shuffle — document payloads stay at the scan. The dup-gram
    * table is a gram-keyed groupBy (distinct-doc count ≥ 2), covered
    * positions explode each matched gram's n-width span, survivors
    * anti-join on (id, position), and reassembly is one id-shuffle of
    * word-sized rows with an in-group sort. Returns
    * (id, n_tokens, n_removed, kept_text). */
  def exactSubstrRemove(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val words = df.select(col(idCol),
      posexplode(TextAnalysis.wordArr(col(textCol))).as(Seq("__pos", "__w")))
    val grams = df.select(col(idCol),
      posexplode(TextAnalysis.wordNgrams(col(textCol), n))
        .as(Seq("__gpos", "__gram")))
    val shared = grams.groupBy("__gram")
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= 2)
      .select("__gram")
    val covered = grams.join(shared, "__gram")
      .select(col(idCol),
        explode(sequence(col("__gpos"), col("__gpos") + (n - 1))).as("__pos"))
      .distinct()
    val kept = words.join(covered, Seq(idCol, "__pos"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      count(lit(1)).as("__n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("__pos").as("p"), col("__w").as("w")))),
        s => s.getField("w")), " ").as("__kept_text"))
    df.select(col(idCol),
        size(TextAnalysis.wordArr(col(textCol))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("__kept_text"), lit("")).as("kept_text"))
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every raw
    * document by how target-like it is under bag-of-hashed-ngram models —
    * `w(doc) = Σ_features log2 p_target(bucket) / p_raw(bucket)` with
    * unigram+bigram features hashed into 256 buckets (the first two hex
    * chars of md5 — engine-replayable, unlike seeded numeric hashes) and
    * add-one smoothing. High weight = target-like; resample the raw
    * corpus by these weights to match a target distribution.
    *
    * Scale shape: two corpus scans (feature explode → 256-bucket counts —
    * the model is 256 rows regardless of corpus size), then one per-doc
    * pass joining features against the broadcast ratio table. Per-doc
    * instances collapse to (doc, bucket) counts BEFORE the weighted sum,
    * so the float accumulation runs over ≤256 exact count×ratio terms —
    * deterministic to well past the rounded precision in any engine.
    * Returns (id, n_features, dsir_weight). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val B = 256
    def feats(df: DataFrame) = df.select(col(idCol),
      explode(concat(TextAnalysis.wordArr(col(textCol)),
        TextAnalysis.wordNgrams(col(textCol), 2))).as("__g"))
      .select(col(idCol), substring(md5(col("__g")), 1, 2).as("__b"))
    val rawFeats = feats(raw)
    val tgtFeats = feats(target)
    val rawCounts = rawFeats.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val tgtCounts = tgtFeats.groupBy("__b").agg(count(lit(1)).as("__ct"))
    // totals fold off the 256-row count frames — NOT off the feature
    // frames, which would re-scan and re-explode the whole corpus
    val rawTotal = rawCounts.agg(coalesce(sum(col("__cr")), lit(0L)).as("__tr"))
    val tgtTotal = tgtCounts.agg(coalesce(sum(col("__ct")), lit(0L)).as("__tt"))
    // 256-row model: log-ratio per bucket, totals folded in as 1-row
    // broadcast stat frames (the LanguageModel pattern)
    val ratios = rawCounts.join(tgtCounts, Seq("__b"), "full")
      .crossJoin(rawTotal).crossJoin(tgtTotal)
      .select(col("__b"),
        (log2((coalesce(col("__ct"), lit(0L)) + 1).cast("double") /
            (col("__tt") + B).cast("double")) -
          log2((coalesce(col("__cr"), lit(0L)) + 1).cast("double") /
            (col("__tr") + B).cast("double"))).as("__lr"))
    val perDoc = rawFeats.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(ratios), "__b")
      .groupBy(idCol)
      .agg(sum(col("__n")).as("__nf"),
        sum(col("__n").cast("double") * col("__lr")).as("__w"))
    raw.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nf"), lit(0L)).as("n_features"),
        // round(3): log2 may differ by an ulp across engines and the
        // ≤256-term sum is order-sensitive; at 1e-3 grid the cumulative
        // ~1e-11 discrepancy cannot flip a rounding boundary
        round(coalesce(col("__w"), lit(0.0)), 3).as("dsir_weight"))
  }

  /** Deterministic sampling hash in ["0000", "ffff"]: the first 4 hex chars
    * of `md5(salt || id)`. Lexicographic compare against a 4-hex-digit
    * threshold selects a `threshold/0x10000` fraction, identically in any
    * engine with md5 (the cross-engine-stable replacement for
    * `rand(seed)`, which no two engines agree on). */
  def sampleHash(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 4)

  /** Deterministic stratified sample: keep a row when its [[sampleHash]] is
    * lexicographically below the stratum's threshold (strata missing from
    * the map are dropped; a threshold above "ffff", e.g. "zzzz", keeps the
    * whole stratum). Per-stratum rates are how pipelines rebalance
    * languages/sources without a shuffle — this is a pure filter, evaluated
    * at the scan. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      thresholds: Map[String, String], salt: String): DataFrame = {
    val thrMap = map(thresholds.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(sampleHash(col(idCol), salt) <
      coalesce(element_at(thrMap, col(strataCol)), lit("")))
  }

  /** Per-group cap: the first `k` rows of each group in `orderCols` order
    * (callers must make the order total — end with a unique id — or ranks
    * are nondeterministic). The per-domain / per-source document cap of
    * web-corpus curation.
    *
    * Two-phase: a single `Window.partitionBy(group)` would stream every
    * row of a group through one task — the biggest domain of a web corpus
    * is a straggler at scale. Phase 1 takes the top `k` within each
    * (group, content-hash bucket) — any bucketing works, since the global
    * top-k is a subset of the union of per-bucket top-ks — so phase 2's
    * real ranking window sees at most `64·k` rows per group. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      k: Int, rankName: String = "rnk"): DataFrame = {
    val bkt = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(64))
    val local = df.withColumn("__bkt", bkt)
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col(groupCol), col("__bkt")).orderBy(orderCols: _*)))
      .filter(col("__lr") <= k)
      .drop("__bkt", "__lr")
    // long rank: SQL row_number() is BIGINT-shaped (DuckDB/PG emit int64)
    local.withColumn(rankName,
        row_number().over(Window.partitionBy(groupCol).orderBy(orderCols: _*))
          .cast("long"))
      .filter(col(rankName) <= k)
  }

  /** Benchmark decontamination: per corpus document, the count of its
    * distinct word `n`-grams that also occur anywhere in `benchmark` —
    * the standard "did the eval set leak into training data" check
    * (GPT-3 App. C / PaLM-style n-gram overlap). Flag and drop (or just
    * audit) documents with any hit.
    *
    * The benchmark side reduces to a distinct gram set FIRST, so the join
    * probe is against O(benchmark grams) keys — broadcast when the
    * benchmark is benchmark-sized, plain equi-join co-partitioned on the
    * gram otherwise. Corpus payloads never move; only (id, gram). */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, cols: Column*) = df.select(cols :+
      explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n)))
        .as("gram"): _*)
    val bGrams = grams(benchmark).distinct()
    val hits = grams(corpus, col(idCol)).join(bGrams, "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }

  /** Redact PII-shaped spans (emails, then long digit runs) and report the
    * redaction count per document. Patterns deliberately stay in the
    * regex subset where Java (Spark) and RE2 (DuckDB/ripgrep) agree —
    * character classes, +/{m,} quantifiers, no backrefs — so the oracle
    * pins byte-identical redacted output. Pure per-row projection: one
    * scan, no shuffle, codegen'd `regexp_replace`/`regexp_count`. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitPattern = "[0-9]{6,}"
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUM>")
  def redactionCount(text: Column): Column =
    (regexp_count(text, lit(EmailPattern)) +
      regexp_count(regexp_replace(text, EmailPattern, "<EMAIL>"),
        lit(LongDigitPattern))).cast("long")

  /** Corpus vocabulary by document frequency: distinct tokens per doc,
    * one (token) count, global top-`topN` by (df desc, token) — the
    * tokenizer-training / idf-table build. Map-side partial aggregation
    * collapses each partition's token multiset before the one shuffle;
    * the top-N is a TakeOrdered, never a full sort. */
  def vocabulary(df: DataFrame, textCol: String, topN: Int): DataFrame =
    df.select(explode(array_distinct(
        split(lower(trim(col(textCol))), "\\s+"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(topN)

  /** Token-budget packing: fill each stratum with documents, in
    * [[sampleHash]] order (deterministic and unbiased — ingest order is
    * neither), until the stratum's token budget is reached; the document
    * that crosses the budget line is kept (first-fit semantics, so a
    * stratum with any document is never empty). The "give me 1B tokens per
    * language" selection step of every mixture-weighted training run.
    *
    * The running sum is a TWO-LEVEL parallel prefix sum, not one window
    * per stratum: `Window.partitionBy(stratum)` alone would stream every
    * document of a language through a single task — a straggler (or OOM)
    * when one stratum is 40% of 100 TB. Instead the first two hash chars
    * split each stratum into 256 buckets whose per-bucket totals (a tiny
    * aggregate) prefix-sum into bucket offsets; each document then only
    * windows WITHIN its (stratum, bucket) — 256× the parallelism, and the
    * bucket is a PREFIX of the sort key, so offset + intra-bucket running
    * sum equals the single-window running sum exactly (the oracle replays
    * the plain one-window form). */
  def tokenBudgetPack(df: DataFrame, strataCol: String, idCol: String,
      tokenCountCol: String, budgets: Map[String, Long],
      salt: String): DataFrame = {
    val budgetMap = map(budgets.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val withH = df
      .withColumn("__h", sampleHash(col(idCol), salt))
      .withColumn("__bkt", substring(col("__h"), 1, 2))
    val bktTotals = withH.groupBy(strataCol, "__bkt")
      .agg(sum(col(tokenCountCol)).as("__bt"))
    // exclusive prefix over ≤256 bucket rows per stratum — trivially small
    val wBuckets = Window.partitionBy(strataCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bktTotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    // unique order key (id tiebreak) makes RANGE == ROWS, but spell out
    // ROWS so the frame is engine-independent by construction
    val wIntra = Window.partitionBy(strataCol, "__bkt")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withH.join(offsets, Seq(strataCol, "__bkt"))
      .withColumn("running_tokens",
        col("__off") + sum(col(tokenCountCol)).over(wIntra))
      .filter(col("running_tokens") - col(tokenCountCol) <
        coalesce(element_at(budgetMap, col(strataCol)), lit(0L)))
      .drop("__h", "__bkt", "__off")
  }

  /** Sliding-window token chunking with overlap — the "split every document
    * into model-context-sized pieces" step that precedes tokenization in
    * every pretraining pipeline. Chunk `i` covers whitespace tokens
    * `[i·step, i·step + chunkSize)` with `step = chunkSize - overlap`;
    * starts are generated while `start < n_tokens`, so every token lands in
    * at least one chunk and short documents yield exactly one.
    *
    * Shape at scale: a pure per-row `posexplode` projection — the token
    * array is bound once per row, starts enumerate via `sequence`, and no
    * shuffle or driver round-trip exists anywhere. Output order is
    * (id, chunk_id) within the input partitioning. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): $overlap vs $chunkSize")
    val step = chunkSize - overlap
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__t"))
      .select(col(idCol), col("__t"), posexplode(
        sequence(lit(0), size(col("__t")) - 1, lit(step)))
        .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__t"), col("__start") + 1, lit(chunkSize)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__c"))).as("chunk_md5"))
  }

  /** Deterministic train/val/test assignment from the [[sampleHash]] of the
    * document id: hash < `trainThr` → train, < `valThr` → val, else test
    * (thresholds are 4-hex-digit fractions of 0x10000, e.g. "cccc"/"e666"
    * ≈ 80/10/10). The split survives re-ingestion, dedup order, and engine
    * changes — the property that matters when the same corpus is re-cut
    * across runs. Pure projection, evaluated at the scan. */
  def splitAssign(id: Column, salt: String,
      trainThr: String = "cccc", valThr: String = "e666"): Column = {
    val h = sampleHash(id, salt)
    when(h < trainThr, "train").when(h < valThr, "val").otherwise("test")
  }

  /** Leakage-safe splits: every member of a near-duplicate component lands
    * in the SAME split. Per-document hashing ([[splitAssign]]) puts two
    * near-copies on opposite sides of the train/test fence with
    * probability 2·p·(1−p) — memorized-duplicate leakage that inflates
    * eval scores. Hashing the component LABEL instead closes the hole:
    * label = min reachable id over the verified near-dup pair graph
    * ([[TextDedup.connectedComponents]]). Singletons carry their own id as
    * label, so they reduce to per-document hashing and the overall
    * fractions stay at the design ratios.
    *
    * Returns the input plus `cluster` (component label) and `split`.
    * Scale shape: component labeling is O(edges) per round, the label
    * attach is one (id → label) equi-join, and the split itself is a pure
    * scan-level hash — document payloads shuffle once. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      salt: String): DataFrame = {
    val labels = TextDedup.connectedComponents(
      docs.select(col(idCol).as("__id")), pairs)
    docs.join(labels, col(idCol) === col("__id"))
      .withColumn("split", splitAssign(col("__lbl"), salt))
      .withColumn("cluster", col("__lbl"))
      .drop("__id", "__lbl")
  }

  /** Temperature-weighted mixture resampling at α = 1/2: each stratum keeps
    * a `sqrt(min_count / count)` fraction of its documents, so after
    * sampling the stratum sizes are proportional to `sqrt(count)` — the
    * "flatten the source distribution" step (multilingual / multi-source
    * mixtures á la CC-100) without an explicit per-stratum rate table.
    * α is fixed at 1/2 because `sqrt` is IEEE-correctly-rounded in every
    * engine, which keeps the acceptance thresholds (and therefore the
    * exact kept-set) oracle-replayable; a generic `pow(n, α-1)` is not.
    *
    * The acceptance rate quantizes to a 4-hex-digit [[sampleHash]]
    * threshold (floor to 1/65536 granularity; rate 1.0 keeps everything),
    * so selection is the same pure scan-level filter as
    * [[stratifiedSample]]. Shape at scale: one tiny per-stratum count
    * aggregate re-joined (broadcast) onto the corpus — document payloads
    * are filtered in place and never shuffle. */
  def temperatureResample(df: DataFrame, strataCol: String, idCol: String,
      salt: String): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val rate = sqrt(min(col("__n")).over(Window.partitionBy()) /
      col("__n").cast("double"))
    val thr = counts.select(col(strataCol), when(rate >= 1.0, lit("zzzz"))
      .otherwise(format_string("%04x",
        floor(rate * 65536).cast("long"))).as("__thr"))
    df.join(broadcast(thr), Seq(strataCol))
      .filter(sampleHash(col(idCol), salt) < col("__thr"))
      .drop("__thr")
  }

  /** Document-frequency rarity score + per-stratum quality buckets — the
    * CCNet-style "rank documents by a cheap LM proxy, keep the head"
    * selection, with corpus-wide document frequency standing in for the
    * language model: a document whose tokens are common corpus-wide
    * (high mean df) scores as head, rare/noisy vocabulary lands in the
    * tail. `ntile(buckets)` per stratum orders by mean df descending, so
    * bucket 1 is the head cut a pipeline would keep.
    *
    * Determinism: the per-document score aggregates INTEGER df counts
    * (`sum`/`count` of longs — order-independent, unlike a double sum),
    * and the single division to a mean happens once per document, so the
    * score and the bucket boundaries replay exactly in any engine; ties
    * break on the id. Shape at scale: the df table is one explode +
    * token-keyed count; the probe is the same explode joined co-partitioned
    * on the token — only (id, token) pairs shuffle, payloads stay put (at
    * 100 TB, shuffle `xxhash64(token)` instead of the text, as
    * [[crossDocNgramStats]] notes). The exact `ntile` DOES sort each
    * stratum's narrow (id, score) rows through one task; past ~10⁸ docs
    * per stratum swap it for approx-quantile score cutoffs
    * (`approxQuantile` per stratum → a scan-level range filter) — same
    * head/tail semantics, no exact oracle. */
  def dfRarityBuckets(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, buckets: Int = 4): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val docFreq = df.select(explode(array_distinct(toks)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__df"))
    val scored = df.select(col(idCol), explode(toks).as("token"))
      .join(docFreq, "token")
      .groupBy(idCol)
      .agg(sum(col("__df")).as("__sum_df"), count(lit(1)).as("n_tok"))
      .select(col(idCol), col("n_tok"),
        (col("__sum_df").cast("double") / col("n_tok")).as("__mean"))
    df.select(col(idCol), col(strataCol)).join(scored, idCol)
      .select(col(idCol), col(strataCol), col("n_tok"),
        round(col("__mean"), 6).as("mean_df"),
        ntile(buckets).over(Window.partitionBy(strataCol)
          .orderBy(col("__mean").desc, col(idCol))).cast("long").as("bucket"))
  }

  /** Training-shard assignment: documents in deterministic [[sampleHash]]
    * order pack into fixed-token-size shards; a document belongs to the
    * shard where its FIRST token lands, so shards are contiguous spans of
    * the hash order (every shard but the last holds ≥ `shardTokens`
    * tokens, and re-running over the same corpus reproduces the same
    * shards byte-for-byte — what makes training restarts and multi-team
    * reproductions possible). The final write step of a curation pipeline:
    * `output.repartitionByRange(col("shard_id"))` then write.
    *
    * Same two-level parallel prefix sum as [[tokenBudgetPack]]: per-bucket
    * totals (256 buckets on the first two hash chars) prefix-sum into
    * offsets on the driver-sized side, each document windows only within
    * its bucket — no single task ever sees the whole corpus, and because
    * the bucket is a prefix of the sort key the assignment equals the
    * one-window form the oracle replays. */
  def shardAssign(df: DataFrame, idCol: String, tokenCountCol: String,
      shardTokens: Long, salt: String): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    val withH = df
      .withColumn("__h", sampleHash(col(idCol), salt))
      .withColumn("__bkt", substring(col("__h"), 1, 2))
    val bktTotals = withH.groupBy("__bkt")
      .agg(sum(col(tokenCountCol)).as("__bt"))
    val wBuckets = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bktTotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    val wIntra = Window.partitionBy("__bkt")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withH.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__run", col("__off") + sum(col(tokenCountCol)).over(wIntra))
      .withColumn("shard_id",
        floor((col("__run") - col(tokenCountCol)).cast("double") /
          shardTokens).cast("long"))
      .drop("__h", "__bkt", "__off", "__run")
  }

  /** Weighted sampling: systematic PPS (probability proportional to size,
    * Madow's method) over a deterministic md5 traversal order. Exactly `k`
    * selections land across the weight line (`Σ multiplicity = k` always):
    * a document is picked each time a multiple of `W/k` falls inside its
    * weight interval, so `multiplicity = ⌊run·k/W⌋ − ⌊(run−w)·k/W⌋` and a
    * document heavier than `W/k` can be drawn more than once — the
    * standard PPS semantics a mixture-weighted corpus draw needs.
    *
    * Everything is INTEGER arithmetic (no transcendentals — an
    * Efraimidis–Spirakis exponential key would hang the selection on
    * libm's `pow`/`ln` rounding, which differs between engines), so the
    * sample is oracle-exact, reproducible, and engine-portable. Scale
    * shape: the same two-level prefix sum as [[shardAssign]] (per-bucket
    * totals → broadcast offsets → within-bucket windows), the grand total
    * is a 1-row broadcast — no single task sees the corpus. */
  def ppsSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val withH = df.filter(col(weightCol) > 0)
      .withColumn("__h", sampleHash(col(idCol), salt))
      .withColumn("__bkt", substring(col("__h"), 1, 2))
    val bktTotals = withH.groupBy("__bkt")
      .agg(sum(col(weightCol)).as("__bt"))
    val wBuckets = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bktTotals
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    val wIntra = Window.partitionBy("__bkt")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = withH.agg(sum(col(weightCol)).as("__W"))
    withH.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__run",
        col("__off") + sum(col(weightCol)).over(wIntra))
      .crossJoin(broadcast(total))
      .withColumn("multiplicity", expr(
        s"(__run * $k) div __W - ((__run - $weightCol) * $k) div __W"))
      .filter(col("multiplicity") > 0)
      .select(col(idCol), col(weightCol), col("multiplicity"))
  }

  /** C4-style composite quality filter: the FIRST failing rule names the
    * drop reason ('keep' when none fails), so filter attrition is
    * attributable per rule — the audit table every curation run reports.
    * All signals are deterministic double arithmetic over exact integer
    * counts (identical IEEE ops in any engine), so the rule outcomes are
    * oracle-exact, not just approximately right. Pure projection. */
  def qualityFilterReason(text: Column, minChars: Int = 50,
      maxPunct: Double = 0.1, maxDupWords: Double = 0.6): Column =
    when(length(text) < minChars, "too_short")
      .when(TextAnalysis.punctRatio(text) > maxPunct, "high_punct")
      .when(TextAnalysis.meanWordLen(text) < 3.0 ||
        TextAnalysis.meanWordLen(text) > 10.0, "word_len")
      .when(TextAnalysis.dupWordFrac(text) > maxDupWords, "repetitive")
      .otherwise("keep")
}
