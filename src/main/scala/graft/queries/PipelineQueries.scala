package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Multimodal, Packing, Sampling, Similarity, TextAnalysis}

/** LLM-data-pipeline queries (SURVEY §2.5 / BASELINE.json north star):
  * dedup, text analysis, similarity search, multimodal — over the
  * documents/embeddings tables, with DuckDB oracles where the kernel is
  * SQL-expressible (hash-based kernels are covered by unit tests +
  * rows-only checks instead).
  */
object PipelineQueries {

  // ------------------------------------------------------------- dedup

  def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir)).orderBy(col("fingerprint"))

  def d2TextStats(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(Tables.documents(s, dir))
      .drop("lang_pred") // argmax-over-profiles is unit-tested, not oracled
      .orderBy(col("doc_id"))

  /** Gopher rule battery (Rae et al. 2021): per-document boolean flags
    * ordered by doc_id plus integer-exact cross-multiplied thresholds —
    * the pretraining corpus filter every large-scale pipeline runs.
    * The oracle replays each rule with the same integer arithmetic.
    */
  def d31Gopher(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherFlags(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Linear quality-classifier inference (the CCNet/RefinedWeb
    * model-filter stage): fixed integer milli-unit weights over
    * capped-length + integer-percentage features, logit and pass flag
    * per document (TextAnalysis.qualityLrScores). The oracle replays
    * the identical integer feature extraction and dot product.
    */
  def d33QualityLr(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityLrScores(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** BPE merge-rule training (Sennrich et al. 2016) — learn the top 6
    * merge rules from the corpus over the frequency-compressed
    * distinct-word vocabulary (TextAnalysis.bpeTrain): char-level
    * symbols within words, weighted pair counts, argmax under the
    * (n desc, lft, rgt) total order, greedy leftmost non-overlapping
    * merge per round. The oracle replays every round as an unrolled
    * CTE chain generated from the same loop.
    */
  def d34BpeTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrain(Tables.documents(s, dir), rounds = BpeTrainRounds)

  /** Tokenize the corpus under the d34-trained merge rules
    * (TextAnalysis.bpeTokenize): the merges apply to training's own
    * final distinct-word symbol state and per-doc counts expand
    * through one token join — the corpus-compression readout. The
    * oracle extends the d34 CTE chain with the per-word symbol
    * count and the doc-token join.
    */
  def d35BpeTokenize(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTokenize(Tables.documents(s, dir),
        rounds = BpeTrainRounds)
      .orderBy(col("doc_id"))

  /** Tokenizer-aware packing composite: the d35 per-document counts
    * under the LEARNED vocabulary feed d12's distributed prefix-sum
    * packer — the end-to-end "tokenize the corpus, cut it into
    * training contexts" layout. Token counts come from real merges,
    * not the whitespace proxy, so pack boundaries are the ones an
    * actual training run would see.
    */
  def p6PackedTokens(s: SparkSession, dir: String): DataFrame = {
    val counts = TextAnalysis.bpeTokenize(Tables.documents(s, dir),
      rounds = BpeTrainRounds)
    Packing.packSequences(counts, col("doc_id"), col("n_tokens"),
        budget = 192L, bucketWidth = 64L)
      .orderBy(col("doc_id"))
  }

  private val BpeTrainRounds = 6

  /** Shared WITH-body for the BPE oracles: vocab -> char state ->
    * BpeTrainRounds unrolled training rounds (the d34 comment explains
    * the shape). Ends at s{rounds}; callers append their readout.
    *
    * Every per-round CTE is `AS MATERIALIZED`: lk/top/mg are each read
    * 2-3 times per round, so DuckDB's default inlining expands the
    * plan tree ~3^rounds deep — d34's readout (top$r only) survived
    * it, but d35's (the DEEPEST state s{rounds}) ran >20 min at
    * sf0.01 before the hint and ~seconds after.
    */
  private def bpeChainSql: String = {
    val roundCtes = (1 to BpeTrainRounds).map { r =>
      s"""lk$r AS MATERIALIZED (SELECT word, freq, pos, sym,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM s${r - 1}),
         |top$r AS MATERIALIZED (SELECT sym AS lft, nxt AS rgt,
         |    CAST(SUM(freq) AS BIGINT) AS n
         |  FROM lk$r WHERE nxt IS NOT NULL GROUP BY sym, nxt
         |  ORDER BY n DESC, lft, rgt LIMIT 1),
         |mg$r AS MATERIALIZED (SELECT word, pos FROM (
         |    SELECT word, pos, min(pos) OVER (PARTITION BY word, grp)
         |      AS run_start
         |    FROM (SELECT lk.word, lk.pos, lk.pos - row_number()
         |        OVER (PARTITION BY lk.word ORDER BY lk.pos) AS grp
         |      FROM lk$r lk, top$r t
         |      WHERE lk.sym = t.lft AND lk.nxt = t.rgt))
         |  WHERE (pos - run_start) % 2 = 0),
         |s$r AS MATERIALIZED (SELECT word, freq,
         |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         |    sym FROM (
         |    SELECT lk.word, lk.freq, lk.pos,
         |      CASE WHEN m.word IS NOT NULL THEN lk.sym || lk.nxt
         |           ELSE lk.sym END AS sym
         |    FROM lk$r lk
         |    LEFT JOIN mg$r m ON m.word = lk.word AND m.pos = lk.pos
         |    LEFT JOIN mg$r d ON d.word = lk.word AND d.pos = lk.pos - 1
         |    WHERE d.word IS NULL))""".stripMargin
    }.mkString(",\n")
    s"""v AS MATERIALIZED (SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split_regex(coalesce(text, ''),
       |      '\\s+')) AS t FROM documents)
       |  WHERE t <> '' GROUP BY t),
       |s0 AS MATERIALIZED (SELECT word, freq, pos,
       |    substr(word, CAST(pos AS INT), 1) AS sym FROM (
       |  SELECT word, freq, unnest(range(1, len(word) + 1)) AS pos
       |  FROM v)),
       |$roundCtes""".stripMargin
  }

  /** Shared WITH-body for the e16/e17 oracles: milli-quantized Gram →
    * one |g| ≤ 1e6 rescale → PcaIters unrolled power-iteration rounds.
    * Ends at x{PcaIters}; callers append their readout.
    */
  private def pcaChainSql: String = {
    val roundCtes = (1 to PcaIters).map { r =>
      s"""y$r AS MATERIALIZED (SELECT g.j, CAST(SUM(g.g * x.v) AS BIGINT) AS y
         |  FROM gram g JOIN x${r - 1} x ON g.k = x.j GROUP BY g.j),
         |m$r AS MATERIALIZED (SELECT GREATEST(MAX(ABS(y)), 1) AS m FROM y$r),
         |x$r AS MATERIALIZED (SELECT j,
         |    CAST((CASE WHEN y < 0 THEN -1 ELSE 1 END)
         |      * ((ABS(y) * 1000) // (SELECT m FROM m$r)) AS BIGINT) AS v
         |  FROM y$r)""".stripMargin
    }.mkString(",\n")
    s"""comps AS MATERIALIZED (SELECT vec_id,
       |    generate_subscripts(embedding, 1) - 1 AS dim,
       |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
       |      AS q
       |  FROM embeddings),
       |g0 AS MATERIALIZED (SELECT a.dim AS j, b.dim AS k,
       |    CAST(SUM(a.q * b.q) AS BIGINT) AS g0
       |  FROM comps a JOIN comps b USING (vec_id) GROUP BY a.dim, b.dim),
       |mg AS MATERIALIZED (SELECT GREATEST(MAX(ABS(g0)), 1) AS mg FROM g0),
       |gram AS MATERIALIZED (SELECT j, k,
       |    CAST((CASE WHEN g0 < 0 THEN -1 ELSE 1 END)
       |      * (ABS(g0) // ((SELECT mg FROM mg) // 1000000 + 1))
       |      AS BIGINT) AS g
       |  FROM g0),
       |x0 AS MATERIALIZED (SELECT DISTINCT j, CAST(1000 AS BIGINT) AS v
       |  FROM gram),
       |$roundCtes""".stripMargin
  }

  /** DSIR importance scores vs the English slice as the target
    * distribution — hashed-bigram bucket models, integer-ppm
    * normalization, ratio-of-ppms weights (TextAnalysis.dsirScores).
    * The oracle replays the identical hash, smoothing, and integer
    * divisions.
    */
  def d32Dsir(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirScores(Tables.documents(s, dir),
        col("lang") === "en", buckets = 64)
      .orderBy(col("doc_id"))

  /** predicted-language distribution (rows-only: heuristic argmax). */
  def d3LangidDist(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stats(Tables.documents(s, dir))
      .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))

  /** exact token-set Jaccard over a bounded pair set (oracle for the
    * MinHash path).
    */
  def d4JaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(s, dir), k = 1, threshold = 0.3,
        maxDocId = 60)
      .orderBy(col("a_id"), col("b_id"))

  /** n-gram (k=3 word-shingle) Jaccard over the same bounded pair set —
    * the higher-order shingle variant of d4 (distinguishes word ORDER,
    * which token-set Jaccard cannot), exact-oracled in SQL.
    */
  def d7ShingleJaccard(s: SparkSession, dir: String): DataFrame =
    // threshold 0.5 isolates the corpus's clone pairs; 3-gram overlap
    // between unrelated docs tops out ≈0.02, so the gap is wide
    Dedup.jaccardPairs(Tables.documents(s, dir), k = 3, threshold = 0.5,
        maxDocId = 500)
      .orderBy(col("a_id"), col("b_id"))

  /** Deterministic hash-split corpus budget: train/val/test membership
    * from the md5-prefix bucket (stable across runs/engines — never
    * rand()), with per-split document and token budgets. The oracle
    * recomputes the identical bucket arithmetic in SQL.
    */
  def d8SplitBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.documents(s, dir)
    Sampling.assignSplit(docs, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("total_tokens"))
      .orderBy(col("split"))
  }

  /** Near-dup-aware train/val/test split (p7): split membership keyed
    * by the near-dup CLUSTER representative so no cluster straddles
    * splits — the eval-leakage guard. Per split: docs, distinct
    * clusters, char volume; plus the leakage witness (clusters seen in
    * >1 split — ZERO by construction, and the oracle replays the same
    * closure + bucket arithmetic so a drift on either side breaks the
    * hash).
    */
  def p7ClusterSplit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.documents(s, dir)
    val pairs = lshDupPairs(s, dir).select(col("a_id"), col("b_id"))
    val split = Sampling.clusterSplit(docs, pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val per = split.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
    val leak = split.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(count(when(col("ns") > 1, 1)).as("leaked_clusters"))
    per.crossJoin(broadcast(leak)).orderBy(col("split"))
  }

  /** Embedding near-dup CLUSTERS (e18): the d9 step for the embedding
    * modality — transitively close the BANDED near-dup pairs (e4's
    * production face) and emit per-cluster rosters with the min-id
    * representative. Same scale shape as d9: the closure's per-round
    * state is (id, comp) longs, text/vectors never enter the loop.
    * The oracle replays banding + exact verify + a recursive-CTE
    * closure end-to-end.
    */
  def e18EmbDupClusters(s: SparkSession, dir: String): DataFrame = {
    // nBits = 6 EXPLICIT: this gate is the oracle-literal regression
    // pin for the fixed knob (the operator's default is now the sized
    // rule; e19 certifies that path)
    val pairs = Dedup.embeddingNearDupBanded(
      Tables.embeddings(s, dir), threshold = 0.4, nBits = 6)
    Dedup.dupClusters(pairs.select(col("a_id"), col("b_id")))
      .groupBy(col("comp").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(sort_array(collect_list(col("id"))),
          _.cast("string")), ",").as("members"))
      .orderBy(col("cluster_rep"))
  }

  /** Embedding near-dup clusters through the SIZED banding path
    * (e19): identical pipeline to e18, but nBits comes from
    * [[Dedup.nBitsForCorpus]] on the ACTUAL corpus count instead of a
    * fixed knob — the production sizing contract (mean band bucket
    * O(1), so in-bucket pair volume stays linear per decade; E4Probe
    * measured 83.7→22.4 s at 10× when the knob tracks the corpus vs
    * 22.5× quadratic at fixed 64 buckets). The oracle replays the
    * SAME integer sizing rule in SQL (smallest b ≥ 4 with 32·2^b ≥
    * count) over a max-width hyperplane literal table, selecting
    * bit < nbits — so a data-scale change re-sizes BOTH engines
    * identically and the hash gate stays closed. The e18 face keeps
    * the fixed knob as the oracle-literal regression pin; this gate
    * is the one that certifies the 100 TB path end-to-end.
    */
  def e19EmbDupSized(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val nBits = Dedup.nBitsForCorpus(emb.count())
    require(nBits <= SizedMaxBits,
      s"corpus outgrew the oracle's $SizedMaxBits-bit hyperplane table " +
        "— widen SizedMaxBits in both faces together")
    val pairs = Dedup.embeddingNearDupBanded(
      emb, threshold = 0.4, nBits = nBits)
    Dedup.dupClusters(pairs.select(col("a_id"), col("b_id")))
      .groupBy(col("comp").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(sort_array(collect_list(col("id"))),
          _.cast("string")), ",").as("members"))
      .orderBy(col("cluster_rep"))
  }

  /** widest nBits the e19 oracle's literal hyperplane table carries:
    * 32·2^16 = 2M vectors before the gate refuses loudly (production
    * code has no such bound — only the SQL-replay face does)
    */
  private val SizedMaxBits = 16

  /** The pair source both cluster gates (d9, d24) feed from: banded
    * MinHash-LSH candidates verified by exact Jaccard — the
    * 100 TB-safe path (bucketed candidate space + skew guard), NOT the
    * brute inverted-index pairer, whose Σf² join volume is the bounded
    * verification path only (its scaladoc's own contract; round-7
    * verdict flagged the unbounded use here as the repo's one scale
    * anti-pattern). 16 bands × 2 rows (32 hashes — half the signature
    * cost of the d5 gate, the dominant local term): a true pair is
    * missed with probability (1−j²)^16, and the corpus's clone pairs
    * all sit at j ≥ 0.9 (measured: min 0.900 at the gate SF), so the
    * miss bound is (1−0.81)^16 ≈ 3e-12; the exact-verify step then
    * makes the emitted pair set IDENTICAL to the brute pairer's
    * whenever recall is total — verified against the recursive-CTE
    * oracle, which still replays the exact closure.
    */
  private def lshDupPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDup(Tables.documents(s, dir), k = 3, numHashes = 32,
      bands = 16, threshold = 0.5)

  /** Near-dup clustering: connected components over the LSH-sourced
    * near-dup pairs (candidates verified by exact Jaccard ≥ 0.5, same
    * pair set as the d7 brute pairer on this corpus) plus the
    * canonical representative and member roster per cluster — the
    * "which copies do I drop" step of a curation pipeline. The oracle
    * replays the closure with a recursive CTE in DuckDB.
    */
  def d9DupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = lshDupPairs(s, dir)
    Dedup.dupClusters(pairs.select(col("a_id"), col("b_id")))
      .groupBy(col("comp").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"),
        array_join(transform(sort_array(collect_list(col("id"))),
          _.cast("string")), ",").as("members"))
      .orderBy(col("cluster_rep"))
  }

  /** Content redaction over the corpus: mask a sensitive term set
    * (the PII-scrub shape — this corpus has no digits/emails, so the
    * masked class is a word list), per-doc hit count + md5 of the
    * scrubbed text. RE2-compatible pattern so DuckDB replays exactly.
    */
  def d10Redact(s: SparkSession, dir: String): DataFrame = {
    val pat = "\\b(key|hash|value)\\b"
    Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.matchCount(col("text"), pat).as("n_hits"),
        md5(TextAnalysis.redact(col("text"), pat, "<MASKED>")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** Per-document top TF-IDF term (integer-exact rational idf). */
  def d11TfidfTop(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTop(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (k=3 grams, w=4 windows) per document —
    * rolling-hash copy-detection summaries; the oracle replays the
    * md5-40-bit gram hash and the BIGINT-encoded window argmin.
    */
  def d18Fingerprints(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Cross-corpus winnowed copy detection — the MOSS use the
    * winnowFingerprintRows scaladoc promises: fingerprint two corpora
    * (here the deterministic even/odd doc_id halves), join on the
    * 40-bit gram hash, and report pairs sharing ≥ 5 fingerprints.
    * On this corpus clone pairs share 9–35 winnowed fingerprints and
    * unrelated pairs at most 2 (31-token vocabulary!), so the
    * threshold sits in a wide gap.
    *
    * Scale shape: the join is the winnowed inverted index — density
    * ~2/(w+1) of grams per doc, join volume Σ_hash f² over that
    * REDUCED set (the whole point of winnowing vs raw-gram
    * contamination joins); everything else is narrow ids + counts
    * with map-side partials.
    */
  def d28CopyDetect(s: SparkSession, dir: String): DataFrame = {
    val fp = Dedup.winnowFingerprintRows(Tables.documents(s, dir))
      .select(col("doc_id"), expr("hp div 1048576").as("h")).distinct()
    val left = fp.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("a_id"), col("h"))
    val right = fp.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("b_id"), col("h"))
    left.join(right, "h")
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Sequence packing: concat-then-chunk the corpus into 256-token
    * packs via the distributed two-level prefix sum (bucketWidth 64 so
    * the gate exercises multiple buckets); the oracle replays the
    * cumulative sum as one SQL window.
    */
  def d12PackSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Packing.packSequences(docs, col("doc_id"),
        TextAnalysis.tokenCount(col("text")), budget = 256L, bucketWidth = 64L)
      .orderBy(col("doc_id"))
  }

  /** Corpus rarity (unigram-LM proxy) per doc — exact integer floor
    * arithmetic, fully oracle-able (no floating logs).
    */
  def d14RarityScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rarityScore(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Gopher-style repetition fractions per doc (top n-gram share for
    * n=1..3) + the composite repetitive flag.
    */
  def d15Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Sliding-window chunk layout (window 128, stride 64) — the RAG
    * dual of d12's pack layout.
    */
  def d16SlidingChunks(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Packing.slidingChunks(docs, col("doc_id"),
        TextAnalysis.tokenCount(col("text")), window = 128L, stride = 64L)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Decontamination: 3-gram collisions between the deterministic
    * train and test splits (d8's buckets) — per train doc.
    */
  def d17Contamination(s: SparkSession, dir: String): DataFrame =
    Dedup.contamination(Tables.documents(s, dir))
      .orderBy(col("doc_id"))

  /** Stratified sample: 10 docs per source, hash-ordered. */
  def d13Stratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, dir),
        col("source"), col("doc_id"), n = 10)
      .select(col("source"), col("sample_rank"), col("doc_id"))
      .orderBy(col("source"), col("sample_rank"))

  /** int8 quantization summaries over the embedding corpus. */
  def e5Quantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .orderBy(col("vec_id"))

  /** Integer-exact Lloyd k-means over milli-quantized embeddings
    * (Similarity.kmeansExact): k=4 seeds from the smallest vec_ids,
    * 2 update rounds, then final assignment metrics. The oracle
    * unrolls the identical iterations as CTEs — same quantization,
    * integer distance/means, and (dist, cid) argmin tie order.
    */
  def e13Kmeans(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansExact(Tables.embeddings(s, dir), k = 4, iters = 2)
      .orderBy(col("centroid_id"))

  /** Greedy k-center coreset selection (farthest-point sampling,
    * Similarity.kcenterSelect): 8 picks, min-vec_id seed, integer
    * micro-cosine proximity. The oracle unrolls the identical 8
    * greedy rounds as CTEs — same quantized cosine, same
    * (maxsim asc, vec_id asc) argmin order.
    */
  def e14Kcenter(s: SparkSession, dir: String): DataFrame =
    Similarity.kcenterSelect(Tables.embeddings(s, dir), k = 8)
      .orderBy(col("pick"))

  /** JL ±1 sign random projection to 8 dims (Similarity.rproj) — the
    * dimensionality-reduction stage ahead of ANN/clustering. Micro-
    * quantized integer sums under the md5-parity sign matrix; the
    * oracle inlines the same hash per (i, j) and replays each output
    * dim as a conditional Σ.
    */
  def e15Rproj(s: SparkSession, dir: String): DataFrame =
    Similarity.rproj(Tables.embeddings(s, dir), k = RprojK)
      .orderBy(col("vec_id"))

  private val RprojK = 8

  /** Dominant embedding direction by integer power iteration
    * (Similarity.pcaTopComponent): one Gram pass over the corpus, then
    * PcaIters constant-size iterations. The oracle unrolls the same
    * iterations as MATERIALIZED CTEs (the d35 lesson: the chain's
    * frames are each read twice per round).
    */
  def e16Pca(s: SparkSession, dir: String): DataFrame =
    Similarity.pcaTopComponent(Tables.embeddings(s, dir), iters = PcaIters)
      .select(col("dim").cast("long").as("dim"), col("weight"))
      .orderBy(col("dim"))

  private val PcaIters = 8

  /** All-but-the-top whitening readout (Similarity.removeTopComponent):
    * per-vector projection coefficient onto the e16 direction and the
    * integer residual L1/checksum after removing it.
    */
  def e17Abtt(s: SparkSession, dir: String): DataFrame =
    Similarity.removeTopComponent(Tables.embeddings(s, dir),
        iters = PcaIters)
      .orderBy(col("vec_id"))

  /** Document-stitch boundary pairs (Dedup.stitchPairs): a's last 3
    * tokens = b's first 3 tokens — k picked so the gate corpus yields
    * real pairs (k >= 5 is empty at sf0.01).
    */
  def d36StitchPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.stitchPairs(Tables.documents(s, dir), k = 3)
      .orderBy(col("a_id"), col("b_id"))

  /** Per-dimension embedding stats (normalization precursor) — exact
    * micro-unit mean accumulation, portable min/max.
    */
  def e6DimStats(s: SparkSession, dir: String): DataFrame =
    Similarity.dimensionStats(Tables.embeddings(s, dir))
      .orderBy(col("pos"))

  /** MinHash-LSH near-dup pairs, hash-oracled end to end. Threshold 0.9
    * on token sets: this corpus shares a tiny vocabulary, so lower
    * thresholds make near-everything a "duplicate" (jaccard ≥ 0.5 holds
    * for ~half of all pairs — measured at sf0.1).
    */
  def d5MinhashPairs(s: SparkSession, dir: String): DataFrame =
    // bands=8 → 8 rows/band: the S-curve knee sits at ~0.88, matched to
    // the 0.9 threshold (rows=4 would flood candidates with j≈0.6 pairs).
    // Portable md5-prefix token hash so the DuckDB oracle replays the
    // WHOLE pipeline (64 derived min-hashes in UBIGINT xorshift, band
    // slices, Jaccard verify) — the xxhash64 fast path stays the API
    // default, recall/precision-pinned in DedupSpec.
    Dedup.minhashNearDup(Tables.documents(s, dir), k = 1, numHashes = 64,
        bands = 8, threshold = 0.9, tokenHash = Dedup.portableTokenHash)
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash signatures with the engine-portable md5-prefix token hash
    * — the DuckDB oracle replays the full 60-bit vote-and-assemble
    * (generated below from one template). The xxhash64 fast path stays
    * the default for simhashNearDup; DedupSpec pins its recall.
    */
  def d6SimhashSigs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(s, dir), Dedup.portableTokenHash)
      .orderBy(col("doc_id"))

  /** SimHash near-dup PAIRS — the banded hamming join completing d6's
    * signature stage (detect step of the simhash dedup family). At
    * maxHamming = 3 the 4-chunk banding is recall-lossless, so the
    * oracle recomputes the same 60-bit portable signatures and takes
    * plain all-pairs hamming ≤ 3 — band replay unnecessary. subset = 1
    * is EXPLICIT: this gate is the classic-scheme (m = 1) oracle pin;
    * the API default is the corpus-sized auto path (round-13 verdict
    * task 2), whose m choice DedupSpec pins separately.
    */
  def d27SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(Tables.documents(s, dir), maxHamming = 3,
        tokenHash = Dedup.portableTokenHash, subset = 1)
      .orderBy(col("a_id"), col("b_id"))

  /** SimHash near-dup pairs through the SIZED banding path (d37): the
    * e19 treatment for the hamming family — subset = 2 keys the
    * candidate join on pairs-of-5-chunks (≥ 2^24 buckets instead of
    * the classic scheme's fixed 2^16), the shape the
    * [[Dedup.simhashSubsetForCorpus]] rule selects once the corpus
    * passes 131k docs (the measured r14 knee; it was ~2.1M before the
    * knee probe showed m=1 already 8.2× slower at 1.6M docs). The gate FORCES subset = 2 because the rule
    * itself picks m = 1 at every test SF (its decade thresholds are
    * spec-pinned in DedupSpec); what needs a hash-oracled gate is the
    * m = 2 PHYSICAL path. Pigeonhole keeps recall lossless at every
    * subset size (5 chunks, ≤ 3 differ ⇒ some pair of chunks agrees),
    * so the oracle is the SAME all-pairs hamming replay as d27 — the
    * knob moves candidate volume only, never the output.
    */
  def d37SimhashSized(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(Tables.documents(s, dir), maxHamming = 3,
        tokenHash = Dedup.portableTokenHash, subset = 2)
      .orderBy(col("a_id"), col("b_id"))

  // -------------------------------------------------------- similarity

  private def queriesDf(s: SparkSession, dir: String, n: Long): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  /** brute-force exact top-3 cosine neighbors for 5 query vectors. */
  def e1KnnBrute(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(queriesDf(s, dir, 5), Tables.embeddings(s, dir), 3)
      .orderBy(col("query_id"), col("rank"))

  /** fixed-radius range search: every corpus match with cosine ≥ 0.3
    * for the same 5 query vectors — the no-window dual of e1 (a query
    * may legitimately return zero rows; no rank is assigned).
    */
  def e12RangeSearch(s: SparkSession, dir: String): DataFrame =
    Similarity.rangeSearch(queriesDf(s, dir, 5), Tables.embeddings(s, dir), 0.3)
      .orderBy(col("query_id"), col("vec_id"))

  /** per-domain document cap (15 smallest doc_ids per source survive)
    * via the bounded top-k aggregator — the map-side-combine capping
    * path, summarized per source against the uncapped totals.
    */
  def d30SourceCaps(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val kept = Sampling.capPerGroup(
        docs.select(col("source"), col("doc_id")), "source", "doc_id", 15)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"))
      .orderBy(col("source"))
  }

  /** LSH-bucketed approximate top-3. Approximate ≠ un-oracle-able
    * (round-7 verdict): the hyperplanes are deterministic seeded
    * constants, so the oracle replays the ENTIRE scheme — 8 tables ×
    * 8 sign bits from the same plane literals, the same hamming-1
    * multi-probe, exact cosine rerank — and must agree row-for-row.
    * Only the bit SIGNS must agree across engines (dot margins on
    * this corpus are ~1e-3; cross-engine accumulation noise ~1e-13).
    */
  def e2LshTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(queriesDf(s, dir, 20), Tables.embeddings(s, dir), 3,
        nBits = 8)
      .orderBy(col("query_id"), col("rank"))

  /** IVF probe approximate top-3 over the deterministic seeded coarse
    * quantizer (ivfTopKSeeded) — cell assignment and 2-cell probing
    * replay exactly in SQL, closing the last ANN no-oracle gap; the
    * trained k-means quantizer's recall is pinned in SimilaritySpec.
    */
  def e3IvfTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKSeeded(queriesDf(s, dir, 20), Tables.embeddings(s, dir), 3)
      .orderBy(col("query_id"), col("rank"))

  /** SemDeDup-style cluster profile — the cluster-balance report a
    * curation pipeline reads before pruning: assign every embedding to
    * its cell under the deterministic seeded quantizer (the e3
    * machinery), join document metadata, and report per-cell size,
    * language mix, and char mass. Map-only assignment + one hash-agg;
    * the oracle replays the identical round-6 argmax.
    */
  def e7ClusterProfile(s: SparkSession, dir: String): DataFrame =
    Similarity.seededCells(Tables.embeddings(s, dir))
      .join(Tables.documents(s, dir).select(col("doc_id").as("vec_id"),
        col("lang"), col("n_chars")), "vec_id")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("vec_id")).as("min_doc"))
      .orderBy(col("cell"))

  /** Product-quantization ADC approximate top-3 — the compressed
    * exhaustive-scan ANN (8-byte codes vs 256-byte float32 vectors;
    * Jégou et al., TPAMI 2011). The seeded sub-codebooks, micro-unit
    * integer LUT/ADC scores, and exact rerank all replay in SQL from
    * the same 16 lowest-vec_id corpus rows the Spark side collects,
    * so the gate is hash-exact like e2/e3; the semantic recall floor
    * vs e1 brute force is pinned in SimilaritySpec.
    */
  def e8PqTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopKSeeded(queriesDf(s, dir, 20), Tables.embeddings(s, dir), 3)
      .orderBy(col("query_id"), col("rank"))

  /** SemDeDup semantic prune report: within each seeded-quantizer cell
    * (the e7 clustering), prune every vector with a round-6 cosine ≥
    * τ neighbor of smaller vec_id — the deterministic one-pass variant
    * of the paper's keep-one rule. τ matches e4's near-dup band for
    * this corpus (weakly clustered synthetic embeddings: cross-pair
    * cosines concentrate near 0, so ≥ 0.2 is a real semantic-dup
    * signal, not noise).
    */
  def e9SemdedupPrune(s: SparkSession, dir: String): DataFrame =
    Similarity.semdedupPrune(Tables.embeddings(s, dir), tau = 0.2)
      .orderBy(col("cell"), col("vec_id"))

  /** IVF-PQ approximate top-3 — the composed production ANN layout:
    * seeded coarse cells prune (e3), seeded PQ codes compress (e8),
    * exact rerank on the short list. Fully SQL-replayed like both
    * parents; recall floor vs e1 pinned in SimilaritySpec.
    */
  def e10IvfpqTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopKSeeded(queriesDf(s, dir, 20), Tables.embeddings(s, dir), 3)
      .orderBy(col("query_id"), col("rank"))

  /** MMR diversified top-5 over a fixed 60-candidate pool for 3 query
    * vectors ([[Similarity.mmrSelect]]) — the post-ANN re-rank that
    * trades relevance for coverage. λ is 3/4 by construction so the
    * greedy loop compares exact quarter-micro INTEGER scores (see
    * mmrSelect's determinism contract — engine round() disagreements
    * near .5e-6 boundaries are why the loop carries no float at all).
    * The pool is an id-range here so the oracle stays a linear replay;
    * in production the pool is the e2/e3 ANN output.
    */
  def e11Mmr(s: SparkSession, dir: String): DataFrame =
    Similarity.mmrSelect(queriesDf(s, dir, 3),
        Tables.embeddings(s, dir)
          .filter(col("vec_id") >= 5 && col("vec_id") < 65),
        k = 5)
      .orderBy(col("query_id"), col("pick"))

  /** embedding cosine near-dup pairs through the PRODUCTION face
    * (VERDICT r10 #5): sign-LSH banding over the FULL embeddings table
    * — no vec_id bound — then exact-cosine verify; the oracle replays
    * the deterministic banding in SQL (the e2 pattern). The bounded
    * all-pairs form ([[Dedup.embeddingNearDup]]) remains as the
    * recall-floor reference in DedupSpec.
    */
  def e4EmbNearDup(s: SparkSession, dir: String): DataFrame =
    // nBits = 6 EXPLICIT — the fixed-knob oracle pin (the operator
    // default is the corpus-sized rule; e19 gates that path)
    Dedup.embeddingNearDupBanded(Tables.embeddings(s, dir), threshold = 0.4,
        nBits = 6)
      .orderBy(col("a_id"), col("b_id"))

  // -------------------------------------------------------- multimodal

  /** Binary-payload exact dedup — the image/audio checksum dedup of a
    * multimodal ingest: one hash-shuffle on md5(bytes), winner = min
    * media_id (d1's shape over a binary column; the payload itself
    * never shuffles, only the 32-char digest). The oracle hashes the
    * text the bytes were encoded from — identical UTF-8 octets.
    */
  def m4MediaDedup(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(s, dir))
      .groupBy(md5(col("bytes")).as("content_md5"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** media metadata decoded from REAL bytes: the media table gains a
    * 12-byte binary container header (magic ‖ u16be dims ‖ u32be rate,
    * `Multimodal.withHeader`) and every reported field below is parsed
    * back out of the blob's first bytes by `Multimodal.decodeHeader` —
    * an actual binary-format parse, not metadata-column passthrough.
    * The oracle rebuilds the identical blob in DuckDB and decodes it
    * with the same byte arithmetic over hex(blob).
    */
  def m1MediaMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withHeader(
      Multimodal.mediaTable(Tables.documents(s, dir)))
    Multimodal.decodeHeader(media).orderBy(col("media_id"))
  }

  /** ViT-style tile-grid bookkeeping over image rows — metadata-only
    * (bytes never read).
    */
  def m5Tiles(s: SparkSession, dir: String): DataFrame =
    Multimodal.tileGrid(
        Multimodal.mediaTable(Tables.documents(s, dir)), tileSize = 224)
      .orderBy(col("media_id"))

  /** decode/feature-extract via mapPartitions — EVERY kind is REAL
    * decoding end-to-end (round-10 close): the ingest re-encodes each
    * row in its kind's actual container format (image → P5 PGM, audio
    * → RIFF/WAVE, video → YUV4MPEG2 Cmono; every blob opens in a
    * standard viewer/player) and the per-partition kernel dispatches
    * the matching byte-level parser — PGM raster walk, WAV chunk walk,
    * Y4M frame walk. Nothing is passed through from metadata columns:
    * width/height/n_bytes/mean/checksum all come from the DECODED
    * bytes. The oracle rebuilds all three branches with DuckDB byte
    * arithmetic over the same payloads.
    */
  def m2MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s,
        Multimodal.toY4m(Multimodal.toWav(Multimodal.toPgm(
          Multimodal.mediaTable(Tables.documents(s, dir))))))
      .toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_bytes"), col("checksum"),
        round(col("mean_byte"), 6).as("mean_byte"), col("n_frames"))
      .orderBy(col("media_id"))

  /** Perceptual-hash image dedup over REAL decoded pixels: each image
    * row is wrapped as a true P5 PGM, `decodePgmAhash` walks the
    * container and computes the 64-bit average hash from actual
    * raster bytes (bit i = pixel i ≥ integer mean, two unsigned
    * 32-bit halves), and the banded hamming join surfaces near-dup
    * pairs at distance ≤ 3 — the image-dedup stage of a multimodal
    * corpus pipeline. Output: per image, its hash halves, popcount,
    * and near-dup degree. The oracle replays pixel arithmetic over
    * the payload and plain all-pairs hamming (band recall is lossless
    * at ≤ 3, the d27 argument).
    */
  def m8Phash(s: SparkSession, dir: String): DataFrame = {
    val h = Multimodal.imageAhash(s,
        Multimodal.toPgm(Multimodal.mediaTable(Tables.documents(s, dir))))
      .toDF()
    // distinct-hash-compressed counting (Multimodal.ahashNearDupCounts)
    // — the banded join runs over distinct hashes, so candidate volume
    // scales with content diversity, not corpus size (AhashProbe:
    // 195× vs 15.5× volume growth under 10× replication)
    val cnt = Multimodal.ahashNearDupCounts(h, maxHamming = 3)
    h.join(cnt, Seq("media_id"))
      .select(col("media_id"), col("ahash_lo"), col("ahash_hi"),
        col("nbits"), col("n_neardup"))
      .orderBy(col("media_id"))
  }

  /** REAL audio decode end-to-end (round 10): audio rows are wrapped
    * as canonical RIFF/WAVE files (`Multimodal.toWav` — 8-bit mono PCM,
    * opens in any audio tool) and `Multimodal.decodeWav` chunk-walks
    * the container (fmt validation, sample RATE read from the fmt
    * chunk bytes) and computes per-SAMPLE integer statistics: min/max/Σ
    * amplitude plus the 100-level crossing count. The oracle replays
    * the same arithmetic over the payload bytes.
    */
  def m6Audio(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractWavFeatures(s,
        Multimodal.toWav(Multimodal.mediaTable(Tables.documents(s, dir))))
      .toDF()
      .orderBy(col("media_id"))

  /** REAL video decode end-to-end (round-10 close, retiring the last
    * stubbed kind): video rows are wrapped as YUV4MPEG2 Cmono streams
    * (`Multimodal.toY4m` — ASCII stream header + FRAME markers + raw
    * 8×8 luma frames; ffmpeg opens them) and `Multimodal.decodeY4m`
    * walks the container — magic/tag parse, colorspace check,
    * per-frame marker + raster — computing per-PIXEL integer stats
    * (min/max/Σ luma) plus the inter-frame motion proxy
    * Σ|ΔlumaSum| between consecutive frames. Width/height/fps come
    * from the stream header BYTES. The oracle replays the identical
    * frame arithmetic over the payload bytes.
    */
  def m7Video(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractY4mFeatures(s,
        Multimodal.toY4m(Multimodal.mediaTable(Tables.documents(s, dir))))
      .toDF()
      .orderBy(col("media_id"))

  /** frame sampling over video rows — oracle via ceil arithmetic. */
  def m3FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.mediaTable(Tables.documents(s, dir)))
      .orderBy(col("media_id"))

  /** Flagship corpus-curation composite — the end-to-end shape of a
    * training-data pipeline, each stage an operator from this module:
    * quality-gate → exact dedup (keep lowest doc_id) → per-language
    * token/char budget report. Deterministic throughout, so the whole
    * pipeline is one SQL oracle.
    */
  def p1CorpusCuration(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val scored = docs.select(col("doc_id"), col("lang"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val gated = scored.filter(col("quality") >= 0.5)
    // exact dedup: survivor = min doc_id per fingerprint
    val winners = gated.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
    val kept = gated.join(winners, Seq("fingerprint", "doc_id"))
    // avg quality via exact micro-units (a double SUM would be
    // association-order dependent across engines)
    kept.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        (sum(round(col("quality") * 1000000).cast("long")) / 1000000.0 /
          count(lit(1))).as("avg_quality"))
      .orderBy(col("lang"))
  }

  /** RAG retrieval composite — the second end-to-end flagship: quality
    * -gate the corpus (language + length), align the multimodal rows
    * (documents ⋈ embeddings on doc_id = vec_id), exact top-5 cosine
    * retrieval for 3 query vectors, then re-attach the answer-context
    * metadata. Filter → join → ANN → join declared as ONE plan: the
    * doc filter prunes the corpus BEFORE any vector math, the query
    * side broadcasts, and only (id, score) pairs reach the ranking
    * window.
    */
  def p2RagRetrieval(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("lang") === "en" && col("n_chars") >= 200)
    val corpus = Tables.embeddings(s, dir)
      .join(docs.select(col("doc_id").as("vec_id")), "vec_id")
      .select(col("vec_id"), col("embedding"))
    Similarity.bruteForceTopK(queriesDf(s, dir, 3), corpus, 5)
      .join(docs.select(col("doc_id").as("vec_id"), col("source"),
        col("n_chars")), "vec_id")
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"),
        col("source"), col("n_chars"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** cross-doc segment (line) dedup — boilerplate segments shared by
    * more than one document are dropped from every carrier.
    */
  def d19SegmentDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.segmentDedup(Tables.documents(s, dir), segWords = 10,
        maxDocFreq = 1)
      .orderBy(col("doc_id"))

  /** z-order layout audit: the interleaved key's per-16k-cell
    * histogram over (l_partkey, l_suppkey) — pins the full Morton
    * arithmetic (any bit misplacement moves rows across cells).
    */
  def d20Zorder(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Layout
    Tables.lineitem(s, dir)
      .select(Layout.zValue(col("l_partkey"), col("l_suppkey"), 16).as("z"))
      .groupBy(expr("z div 16384").as("z_cell"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"),
        max(col("z")).as("z_max"))
      .orderBy(col("z_cell"))
  }

  /** Temperature-balanced language mixing — the multilingual data-
    * mixture step (upsample tail languages, downsample the head):
    * weight_l ∝ tokens_l^α. α = 0.5 exactly, because sqrt is an
    * IEEE-754 correctly-rounded operation — bit-identical across
    * engines, unlike pow(x, 0.7)'s libm variance. One tiny aggregate
    * over per-language token counts; the share division happens on
    * the |languages|-row frame.
    */
  def d21LangMix(s: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("tokens"))
      // micro-unit BIGINT weights (the e6_dim_stats pattern): the
      // cross-language SUM stays exact integer arithmetic, so no
      // fp-accumulation-order drift between engines; sqrt itself is
      // IEEE-correctly-rounded and safe
      .withColumn("w",
        floor(sqrt(col("tokens").cast("double")) * 1e6 + 0.5).cast("long"))
    val total = perLang.agg(sum(col("w")).as("w_total"))
    perLang.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("tokens"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6)
          .as("mix_share"))
      .orderBy(col("lang"))
  }

  /** Pretrain-mix composite — the third end-to-end flagship, chaining
    * the round-6 surface: quality-gate the corpus, strip cross-doc
    * boilerplate segments (d19's operator), then compute temperature-
    * balanced language mix weights (d21's α = 0.5 arithmetic) over
    * the CLEANED character mass. Gate → dedup → mixture as one plan:
    * per language, surviving docs, kept/total segment counts, cleaned
    * characters, and the final sampling share.
    */
  def p3PretrainMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
    val cleaned = Dedup.segmentDedup(docs, segWords = 10, maxDocFreq = 1)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val perLang = cleaned.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_segments")).cast("long").as("segments"),
        sum(col("n_kept")).cast("long").as("kept_segments"),
        sum(col("kept_chars")).cast("long").as("clean_chars"))
      .withColumn("w",
        floor(sqrt(col("clean_chars").cast("double")) * 1e6 + 0.5)
          .cast("long"))
    val total = perLang.agg(sum(col("w")).as("w_total"))
    perLang.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("segments"),
        col("kept_segments"), col("clean_chars"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6)
          .as("mix_share"))
      .orderBy(col("lang"))
  }

  /** Dedup ACT step — the half d9 stops short of: detect (banded-LSH
    * candidates, exact-verified) → cluster (min-label propagation) → DROP every
    * non-representative member, keeping one doc per cluster (the min
    * doc_id, which IS the cluster label) plus all unclustered docs;
    * then summarize the surviving corpus per language. This is the
    * operation a curation pipeline actually ships — the clusters
    * themselves are only evidence.
    *
    * Scale shape: the doomed set is narrow ids (cluster members minus
    * representatives), the survivors come from ONE anti-join on
    * doc_id, and the summary is a map-side-partial aggregate; document
    * text never shuffles.
    */
  def d24DedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = lshDupPairs(s, dir)
    val doomed = Dedup.dupClusters(pairs.select(col("a_id"), col("b_id")))
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    docs.join(doomed, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("lang"))
  }

  /** Vocabulary coverage (tokenizer-design stat): the smallest
    * head-of-Zipf vocabulary covering p% of all token OCCURRENCES,
    * for p ∈ {50, 90, 99} — plus corpus totals. Integer-exact
    * threshold test (cum·100 ≥ p·total), so both engines agree at
    * the boundary.
    *
    * Scale shape: the only non-distributed step is the rank window
    * over the AGGREGATED vocabulary (|V| rows, orders of magnitude
    * smaller than the corpus — the explode + count is map-side
    * partial); the coverage probe is a broadcast join of 3 constant
    * rows against the ranked vocab.
    */
  def d25VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val counts = Tables.documents(s, dir)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("tok"))
    val ranked = counts.select(col("cnt"),
        row_number().over(w).cast("long").as("rk"),
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cum"))
    val totals = counts.agg(count(lit(1)).as("total_vocab"),
      sum(col("cnt")).as("total_tokens"))
    val levels = Seq(50, 90, 99).toDF("coverage_pct")
    ranked.crossJoin(broadcast(totals))
      .join(broadcast(levels),
        col("cum") * 100 >= col("coverage_pct") * col("total_tokens"))
      .groupBy(col("coverage_pct"))
      .agg(min(col("rk")).as("vocab_size"),
        first(col("total_vocab")).as("total_vocab"),
        first(col("total_tokens")).as("total_tokens"))
      .orderBy(col("coverage_pct"))
  }

  /** bigram-LM conditionals over the corpus's top bigrams. */
  def d23BigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLm(Tables.documents(s, dir), topK = 20)

  /** perplexity-style quality filter: top-15 most LM-surprising docs. */
  def d26LmSurprise(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmSurprise(Tables.documents(s, dir), topK = 15)

  /** top-20 adjacent token pairs — the first BPE merge rule's
    * counting pass (tokenizer induction over the corpus).
    */
  def d22BpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.mergePairCounts(Tables.documents(s, dir), topK = 20)

  /** Semantic-curation composite — the fourth flagship: SemDeDup prune
    * (e9) drops within-cell semantic duplicates, the survivors join
    * their documents through the quality gate, and the report is the
    * POST-curation cluster balance (e7's report after the pipeline
    * acted on it). One declared plan: pruned ids are narrow, the
    * anti-join lands before any text scoring, and the final agg is a
    * single hash-shuffle on the cell key.
    */
  def p4SemanticCuration(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val pruned = Similarity.semdedupPrune(emb, tau = 0.2).select(col("vec_id"))
    val kept = Similarity.seededCells(emb).select(col("vec_id"), col("cell"))
      .join(pruned, Seq("vec_id"), "left_anti")
    val scored = Tables.documents(s, dir)
      .select(col("doc_id").as("vec_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    kept.join(scored, "vec_id")
      .filter(col("quality") >= 0.5)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        (sum(round(col("quality") * 1000000).cast("long")) / 1000000.0 /
          count(lit(1))).as("avg_quality"))
      .orderBy(col("cell"))
  }

  /** Fifth flagship composite — the balanced-corpus curation funnel:
    * exact dedup (keep min doc_id per content fingerprint) → per-
    * domain cap (10 survivors per source via the bounded top-k
    * aggregator) → per (source, lang) funnel report. Each stage's
    * survivor count lands in its own column, so the report IS the
    * audit trail a curation run ships (how much each source/language
    * lost at each gate).
    */
  def p5BalancedCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keep = docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val surv = docs.select(col("source"), col("doc_id"))
      .join(keep, Seq("doc_id"), "left_semi")
    val capped = Sampling.capPerGroup(surv, "source", "doc_id", 10)
      .select(col("doc_id"))
    docs.select(col("source"), col("lang"), col("doc_id"))
      .join(keep.withColumn("is_dedup", lit(1)), Seq("doc_id"), "left")
      .join(capped.withColumn("is_capped", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_raw"),
        sum(coalesce(col("is_dedup"), lit(0))).cast("long").as("n_dedup"),
        sum(coalesce(col("is_capped"), lit(0))).cast("long").as("n_capped"))
      .orderBy(col("source"), col("lang"))
  }

  /** Tokenizer-induction round trip: find the corpus's top merge pair
    * (the d22 counting pass, top-1) and APPLY it — greedy leftmost
    * non-overlapping, a real BPE merge step — reporting per-doc token
    * counts before/after. The pair is 1 row of driver state; the
    * oracle recomputes it in a CTE with the identical (n DESC, pair)
    * tie order.
    */
  def d29BpeApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val top = TextAnalysis.mergePairCounts(docs, 1)
      .select(col("pair")).head.getString(0)
    val Array(w1, w2) = top.split(" ", 2)
    TextAnalysis.applyMergeStep(docs, w1, w2).orderBy(col("doc_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d29_bpe_apply" -> (d29BpeApply _),
    "p4_semantic_curation" -> (p4SemanticCuration _),
    "p5_balanced_corpus" -> (p5BalancedCorpus _),
    "p1_corpus_curation" -> (p1CorpusCuration _),
    "p3_pretrain_mix" -> (p3PretrainMix _),
    "d19_segment_dedup" -> (d19SegmentDedup _),
    "d20_zorder" -> (d20Zorder _),
    "d21_lang_mix" -> (d21LangMix _),
    "d22_bpe_pairs" -> (d22BpePairs _),
    "d23_bigram_lm" -> (d23BigramLm _),
    "p2_rag_retrieval" -> (p2RagRetrieval _),
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_text_stats" -> (d2TextStats _),
    "d31_gopher" -> (d31Gopher _),
    "d33_quality_lr" -> (d33QualityLr _),
    "d34_bpe_train" -> (d34BpeTrain _),
    "d35_bpe_tokenize" -> (d35BpeTokenize _),
    "p6_packed_tokens" -> (p6PackedTokens _),
    "d32_dsir" -> (d32Dsir _),
    "m6_audio" -> (m6Audio _),
    "m7_video" -> (m7Video _),
    "m8_phash" -> (m8Phash _),
    "d3_langid_dist" -> (d3LangidDist _),
    "d4_jaccard_pairs" -> (d4JaccardPairs _),
    "d7_shingle_jaccard" -> (d7ShingleJaccard _),
    "d8_split_budget" -> (d8SplitBudget _),
    "d9_dup_clusters" -> (d9DupClusters _),
    "p7_cluster_split" -> (p7ClusterSplit _),
    "e18_emb_dup_clusters" -> (e18EmbDupClusters _),
    "e19_emb_dup_sized" -> (e19EmbDupSized _),
    "d24_dedup_survivors" -> (d24DedupSurvivors _),
    "d25_vocab_coverage" -> (d25VocabCoverage _),
    "d26_lm_surprise" -> (d26LmSurprise _),
    "d10_redact" -> (d10Redact _),
    "d11_tfidf_top" -> (d11TfidfTop _),
    "d12_pack_sequences" -> (d12PackSequences _),
    "d13_stratified" -> (d13Stratified _),
    "d14_rarity_score" -> (d14RarityScore _),
    "d15_repetition" -> (d15Repetition _),
    "d16_sliding_chunks" -> (d16SlidingChunks _),
    "d17_contamination" -> (d17Contamination _),
    "d18_fingerprints" -> (d18Fingerprints _),
    "d28_copy_detect" -> (d28CopyDetect _),
    "e5_quantize" -> (e5Quantize _),
    "e13_kmeans" -> (e13Kmeans _),
    "e14_kcenter" -> (e14Kcenter _),
    "e15_rproj" -> (e15Rproj _),
    "e16_pca" -> (e16Pca _),
    "e17_abtt" -> (e17Abtt _),
    "d36_stitch_pairs" -> (d36StitchPairs _),
    "e6_dim_stats" -> (e6DimStats _),
    "d5_minhash_pairs" -> (d5MinhashPairs _),
    "d6_simhash_sigs" -> (d6SimhashSigs _),
    "d27_simhash_pairs" -> (d27SimhashPairs _),
    "d37_simhash_sized" -> (d37SimhashSized _),
    "e1_knn_brute" -> (e1KnnBrute _),
    "e2_lsh_topk" -> (e2LshTopk _),
    "e3_ivf_topk" -> (e3IvfTopk _),
    "e7_cluster_profile" -> (e7ClusterProfile _),
    "e8_pq_topk" -> (e8PqTopk _),
    "e9_semdedup_prune" -> (e9SemdedupPrune _),
    "e10_ivfpq_topk" -> (e10IvfpqTopk _),
    "e11_mmr" -> (e11Mmr _),
    "e12_range_search" -> (e12RangeSearch _),
    "e4_emb_near_dup" -> (e4EmbNearDup _),
    "d30_source_caps" -> (d30SourceCaps _),
    "m1_media_meta" -> (m1MediaMeta _),
    "m5_tiles" -> (m5Tiles _),
    "m2_media_features" -> (m2MediaFeatures _),
    "m3_frame_sample" -> (m3FrameSample _),
    "m4_media_dedup" -> (m4MediaDedup _),
  )

  /** shared detect→cluster CTE prefix (3-gram shingles, Jaccard ≥ 0.5
    * pairs, min-label components) — one template feeds both the d9
    * cluster report and the d24 survivor selection so the two oracles
    * cannot drift from each other.
    */
  private val dupCompCte =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split_regex(text, '\s+')) >= 3
      |      THEN list_distinct(list_transform(
      |        range(len(string_split_regex(text, '\s+')) - 2),
      |        i -> array_to_string(string_split_regex(text, '\s+')[i+1:i+3], ' ')))
      |      ELSE [array_to_string(string_split_regex(text, '\s+'), ' ')]
      |    END AS sg
      |  FROM documents),
      |pairs AS (
      |  SELECT a_id, b_id FROM (
      |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |      round(CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |            / len(list_distinct(list_concat(a.sg, b.sg))), 6) AS jaccard
      |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  ) WHERE jaccard >= 0.5),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
      |          UNION ALL SELECT b_id, a_id FROM pairs),
      |r(id, c) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.c FROM r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, MIN(c) AS comp FROM r GROUP BY id)""".stripMargin

  private val fingerprintSql =
    "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"
  private val tokensSql = "string_split_regex(text, '\\s+')"
  private val stopListSql = TextAnalysis.EnStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB replay of TextAnalysis.langId's struct-argmax: max score,
    * ties to the lexicographically-largest language (greatest() over
    * (score, lang) structs compares score first, then lang). Generated
    * from LangProfiles so the two sides cannot drift.
    */
  private val langIdSql: String = {
    val langs = TextAnalysis.LangProfiles.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(tk, t -> list_contains($list, t))) AS s_$l"
    }.mkString(",\n    ")
    val maxE = langs.map("s_" + _._1).mkString("greatest(", ", ", ")")
    val tieCases = langs.map(_._1).sorted.reverse
      .map(l => s"WHEN s_$l = $maxE THEN '$l'").mkString("\n      ")
    s"""WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
       |              FROM documents),
       |scores AS (SELECT doc_id,
       |    $scoreCols
       |  FROM toks),
       |pred AS (SELECT doc_id,
       |    CASE WHEN $maxE = 0 THEN 'und'
       |      $tieCases
       |    END AS lang_pred
       |  FROM scores)""".stripMargin
  }

  /** DuckDB replay of the portable-hash simhash: distinct tokens →
    * 60-bit md5-prefix hash → per-bit ±1 votes → bit assembly.
    * Generated from one template (60 vote columns + 60 bit terms) so
    * the two engines cannot drift; bits 60–63 are structurally zero
    * with the 60-bit hash, so only bits 0–59 are emitted.
    */
  /** DuckDB replay of the ENTIRE portable MinHash-LSH pipeline of
    * d5_minhash_pairs: md5-prefix base hash, 64 derived min-hashes via
    * the same xorshift mixer in UBIGINT arithmetic (wrapping left
    * shifts emulated as mask-then-multiply, which cannot overflow),
    * band slices compared as exact 8-tuples (Spark buckets by a hash
    * OF the slice, so absent a 64-bit collision the candidate sets are
    * identical), then exact-Jaccard verification. The maxBucketSize=500
    * mega-bucket skew guard is mirrored here (bsz/bbf) so both engines
    * see the identical candidate set even if a band bucket ever
    * exceeds 500 docs at the verified scale. Stage columns get
    * fresh names (a/b/c/d) so DuckDB lateral alias resolution can
    * never bind a reference to the wrong stage.
    */
  private val minhashSql: String = {
    val n = 64; val bands = 8; val rows = 8
    val s0 = (0 until n).map(i =>
      s"xor(h, CAST(${java.lang.Long.toUnsignedString(Dedup.mixConstant(i))} AS UBIGINT)) AS a$i").mkString(", ")
    val s1 = (0 until n).map(i =>
      s"xor(a$i, (a$i & CAST(2251799813685247 AS UBIGINT)) * CAST(8192 AS UBIGINT)) AS b$i").mkString(", ")
    val s2 = (0 until n).map(i => s"xor(b$i, b$i >> 7) AS c$i").mkString(", ")
    val s3 = (0 until n).map(i =>
      s"xor(c$i, (c$i & CAST(140737488355327 AS UBIGINT)) * CAST(131072 AS UBIGINT)) AS d$i").mkString(", ")
    val mins = (0 until n).map(i =>
      s"MIN(CAST(d$i & CAST(9223372036854775807 AS UBIGINT) AS BIGINT)) AS m$i").mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val sl = (b * rows until (b + 1) * rows).map(i => s"m$i").mkString("[", ", ", "]")
      s"SELECT doc_id, $b AS band, $sl AS sl FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH tok AS (SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
       |    FROM documents)),
       |h AS (SELECT doc_id,
       |    CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS UBIGINT) AS h
       |  FROM tok),
       |x0 AS (SELECT doc_id, $s0 FROM h),
       |x1 AS (SELECT doc_id, $s1 FROM x0),
       |x2 AS (SELECT doc_id, $s2 FROM x1),
       |x3 AS (SELECT doc_id, $s3 FROM x2),
       |sig AS (SELECT doc_id, $mins FROM x3 GROUP BY doc_id),
       |bb AS ($bandRows),
       |bsz AS (SELECT band, sl, COUNT(*) AS c FROM bb GROUP BY band, sl),
       |bbf AS (SELECT bb.doc_id, bb.band, bb.sl FROM bb
       |  JOIN bsz ON bb.band = bsz.band AND bb.sl = bsz.sl
       |  WHERE bsz.c <= 500),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bbf a JOIN bbf b ON a.band = b.band AND a.sl = b.sl
       |    AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
       |ni AS (SELECT c.a_id, c.b_id, COUNT(*) AS ni
       |  FROM cand c
       |  JOIN h ha ON ha.doc_id = c.a_id
       |  JOIN h hb ON hb.doc_id = c.b_id AND hb.h = ha.h
       |  GROUP BY c.a_id, c.b_id)
       |SELECT a_id, b_id, jaccard FROM (
       |  SELECT ni.a_id, ni.b_id,
       |    round(CAST(ni.ni AS DOUBLE) / (sa.n + sb.n - ni.ni), 6) AS jaccard
       |  FROM ni JOIN sizes sa ON sa.doc_id = ni.a_id
       |  JOIN sizes sb ON sb.doc_id = ni.b_id)
       |WHERE jaccard >= 0.9 ORDER BY a_id, b_id""".stripMargin
  }

  /** DuckDB replay of the ENTIRE e2 multi-table multi-probe sign-LSH:
    * the hyperplane constants come from the SAME
    * Similarity.hyperplanes arrays the Spark plan embeds (one source
    * of truth — Double.toString round-trips exactly), each table's
    * signature is 8 CASE-summed sign bits of list_dot_product against
    * those literals, queries probe their bucket plus all 8 hamming-1
    * flips per table, and candidates rerank by round-6 cosine with
    * vec_id tie-break. Engines need only agree on dot SIGNS (margins
    * ~1e-3 on this corpus vs ~1e-13 accumulation noise), and on the
    * rounded cosine (the proven e1 bridge).
    */
  /** DuckDB replay of e4's banded near-dup: the same 8×6-bit sign-LSH
    * tables (plane literals from the identical seeds), DISTINCT
    * candidate pairs from in-bucket collisions, exact round-6 cosine
    * verify at the gate threshold.
    */
  /** DuckDB replay of e18: the e4 banding + verify feeding a
    * recursive-CTE transitive closure and per-cluster rosters (the
    * d9 oracle shape over the embedding modality).
    */
  private val embDupClustersSql: String = {
    val nBits = 6; val tables = 8; val dim = 64; val threshold = 0.4
    def planeLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    val sigSelects = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(nBits, dim, seed = 42L + t)
      val bits = (0 until nBits).map { b =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(planes(b))}) >= 0" +
          s" THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, CAST($bits AS BIGINT) AS sig FROM base"
    }.mkString("\nUNION ALL ")
    s"""WITH RECURSIVE base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |sig AS ($sigSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
       |  WHERE a.vec_id < b.vec_id),
       |pairs AS (SELECT a_id, b_id FROM (
       |  SELECT c.a_id, c.b_id,
       |    round(list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
       |                                 CAST(be.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ae ON ae.vec_id = c.a_id
       |  JOIN embeddings be ON be.vec_id = c.b_id
       |) WHERE cosine >= $threshold),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |r(id, c) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.c FROM r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id, MIN(c) AS comp FROM r GROUP BY id)
       |SELECT comp AS cluster_rep, COUNT(*) AS n_members,
       |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
       |FROM comp GROUP BY comp ORDER BY cluster_rep""".stripMargin
  }

  /** e19 oracle: the SIZED banding path replayed end-to-end. nbits is
    * derived from the corpus count with the same INTEGER rule as
    * [[graft.operators.Dedup.nBitsForCorpus]] (smallest b ≥ 4 with
    * 32·2^b ≥ n — exact in both engines, no float log2), hyperplanes
    * are embedded as a (tbl, bit, plane) literal relation at the max
    * width (Similarity.hyperplanes draws rows sequentially, so the
    * first nbits rows of the 16-bit table ARE the nbits-bit table),
    * and the signature aggregation keeps only bit < nbits.
    */
  private val embDupSizedSql: String = {
    val maxBits = 16; val tables = 8; val threshold = 0.4
    def planeLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    val planeRows = (0 until tables).flatMap { t =>
      val planes = Similarity.hyperplanes(maxBits, dim = 64, seed = 42L + t)
      (0 until maxBits).map(b => s"($t, $b, ${planeLit(planes(b))})")
    }.mkString(",\n")
    s"""WITH RECURSIVE nb AS MATERIALIZED (
       |  SELECT COALESCE(MIN(b), 30) AS nbits
       |  FROM generate_series(4, 30) s(b)
       |  WHERE (32::BIGINT << b) >= (SELECT COUNT(*) FROM embeddings)),
       |base AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |planes(tbl, bit, p) AS (VALUES ${planeRows}),
       |sig AS MATERIALIZED (
       |  SELECT b.vec_id, pl.tbl,
       |    SUM(CASE WHEN list_dot_product(b.v, pl.p) >= 0
       |        THEN (1::BIGINT << pl.bit) ELSE 0 END) AS sig
       |  FROM base b CROSS JOIN planes pl
       |  WHERE pl.bit < (SELECT nbits FROM nb)
       |  GROUP BY b.vec_id, pl.tbl),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
       |  WHERE a.vec_id < b.vec_id),
       |pairs AS MATERIALIZED (SELECT a_id, b_id FROM (
       |  SELECT c.a_id, c.b_id,
       |    round(list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
       |                                 CAST(be.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ae ON ae.vec_id = c.a_id
       |  JOIN embeddings be ON be.vec_id = c.b_id
       |) WHERE cosine >= $threshold),
       |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |r(id, c) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.c FROM r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id, MIN(c) AS comp FROM r GROUP BY id)
       |SELECT comp AS cluster_rep, COUNT(*) AS n_members,
       |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
       |FROM comp GROUP BY comp ORDER BY cluster_rep""".stripMargin
  }

  private val embNearDupBandedSql: String = {
    val nBits = 6; val tables = 8; val dim = 64; val threshold = 0.4
    def planeLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    val sigSelects = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(nBits, dim, seed = 42L + t)
      val bits = (0 until nBits).map { b =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(planes(b))}) >= 0" +
          s" THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, CAST($bits AS BIGINT) AS sig FROM base"
    }.mkString("\nUNION ALL ")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |sig AS ($sigSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.sig = b.sig
       |  WHERE a.vec_id < b.vec_id),
       |scored AS (SELECT c.a_id, c.b_id,
       |    round(list_cosine_similarity(CAST(ae.embedding AS DOUBLE[]),
       |                                 CAST(be.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ae ON ae.vec_id = c.a_id
       |  JOIN embeddings be ON be.vec_id = c.b_id)
       |SELECT a_id, b_id, cosine FROM scored
       |WHERE cosine >= $threshold ORDER BY a_id, b_id""".stripMargin
  }

  private val lshTopkSql: String = {
    val nBits = 8; val tables = 8; val dim = 64; val k = 3; val nq = 20
    def planeLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    val sigSelects = (0 until tables).map { t =>
      val planes = Similarity.hyperplanes(nBits, dim, seed = 42L + t)
      val bits = (0 until nBits).map { b =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(planes(b))}) >= 0" +
          s" THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $t AS tbl, CAST($bits AS BIGINT) AS sig FROM base"
    }.mkString("\nUNION ALL ")
    val flips = (0L +: (0 until nBits).map(b => 1L << b)).mkString("[", ", ", "]")
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |sig AS ($sigSelects),
       |probes AS (SELECT vec_id AS query_id, tbl, xor(sig, f.f) AS sig
       |  FROM sig, unnest($flips) AS f(f) WHERE vec_id < $nq),
       |cand AS (SELECT DISTINCT p.query_id, s.vec_id
       |  FROM probes p JOIN sig s ON s.tbl = p.tbl AND s.sig = p.sig
       |  WHERE s.vec_id <> p.query_id),
       |scored AS (SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
       |                                 CAST(qe.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = c.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of e3's seeded-quantizer IVF: centroids = the 8
    * lowest-vec_id corpus vectors (cid = vec_id by construction),
    * assignment = argmax over round-6 cosine with cid tie-break,
    * queries probe their 2 nearest cells, exact rerank inside.
    */
  private val ivfTopkSql: String = {
    val nCent = 8; val nprobe = 2; val k = 3; val nq = 20
    s"""WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $nCent),
       |ca AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |      c.cv), 6) DESC, c.cid ASC) AS rn
       |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |qa AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |      c.cv), 6) DESC, c.cid ASC) AS rn
       |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < $nq) WHERE rn <= $nprobe),
       |cand AS (SELECT q.query_id, c.vec_id
       |  FROM qa q JOIN ca c ON c.cell = q.cell
       |  WHERE c.vec_id <> q.query_id),
       |scored AS (SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
       |                                 CAST(qe.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = c.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of e8's full PQ scheme: sub-codebooks sliced from
    * the 16 lowest-vec_id corpus vectors (j = vec_id by construction),
    * encode/LUT scores as micro-unit BIGINTs of subvector dot products
    * (floor(x·1e6 + 0.5) — the integer bridge, so the ADC SUM is
    * association-order free), argmax ties to the lower code, ADC
    * top-10 rerank by round-6 cosine. Engines must agree on the
    * micro-rounded dot (the e1 bridge class) and nothing else.
    */
  private val pqTopkSql: String = {
    val nSub = 8; val dsub = 8; val ksub = 16; val k = 3; val nq = 20
    val rerank = 10
    s"""WITH cb AS (SELECT m.m, e.vec_id AS j,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$dsub+1 : m.m*$dsub+$dsub] AS sv
       |  FROM embeddings e CROSS JOIN (SELECT unnest(range($nSub)) AS m) m
       |  WHERE e.vec_id < $ksub),
       |codes AS (SELECT vec_id, m, j AS code FROM (
       |  SELECT e.vec_id, cb.m, cb.j, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id, cb.m
       |      ORDER BY CAST(floor(list_dot_product(
       |        (CAST(e.embedding AS DOUBLE[]))[cb.m*$dsub+1 : cb.m*$dsub+$dsub],
       |        cb.sv) * 1000000 + 0.5) AS BIGINT) DESC, cb.j ASC) AS rn
       |  FROM embeddings e CROSS JOIN cb) WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, cb.m, cb.j,
       |    CAST(floor(list_dot_product(
       |      (CAST(q.embedding AS DOUBLE[]))[cb.m*$dsub+1 : cb.m*$dsub+$dsub],
       |      cb.sv) * 1000000 + 0.5) AS BIGINT) AS pd
       |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < $nq),
       |approx AS (SELECT l.query_id, c.vec_id, SUM(l.pd) AS approx
       |  FROM codes c JOIN lut l ON l.m = c.m AND l.j = c.code
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id),
       |cand AS (SELECT query_id, vec_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, vec_id ASC) AS arank FROM approx)
       |  WHERE arank <= $rerank),
       |scored AS (SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
       |                                 CAST(qe.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = c.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of e10 — the e3 cell CTEs composed with the e8 PQ
    * CTEs: probed cells restrict the ADC join, everything else is
    * identical to the parents (one source of truth per fragment).
    */
  /** DuckDB replay of the MMR greedy selection in exact quarter-micro
    * integer units: micro-quantized components → integer-valued dots
    * (exact in double below 2⁵³) → floor(cos·10⁶+0.5) micro cosines →
    * score_u = 3·simq_u − max cs_u, unrolled 5 picks with
    * (score_u DESC, vec_id) tie order — no engine round() anywhere in
    * the loop (Spark/DuckDB round() disagree near .5e-6 boundaries).
    */
  private val mmrSql: String = {
    val k = 5
    val steps = (2 to k).map { t =>
      s"""p$t AS (SELECT query_id, vec_id, score_u, $t AS pick FROM (
         |  SELECT c2.query_id, c2.vec_id,
         |    3 * c2.simqu - MAX(p.csu) AS score_u,
         |    ROW_NUMBER() OVER (PARTITION BY c2.query_id
         |      ORDER BY 3 * c2.simqu - MAX(p.csu) DESC, c2.vec_id) AS rn
         |  FROM cand c2
         |  JOIN sel${t - 1} s ON s.query_id = c2.query_id
         |  JOIN pairs p ON p.a = c2.vec_id AND p.b = s.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
         |    WHERE x.query_id = c2.query_id AND x.vec_id = c2.vec_id)
         |  GROUP BY c2.query_id, c2.vec_id, c2.simqu) WHERE rn = 1),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> floor(x * 1000000 + 0.5)) AS qv
       |  FROM embeddings WHERE vec_id < 3),
       |c AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> floor(x * 1000000 + 0.5)) AS cv
       |  FROM embeddings WHERE vec_id >= 5 AND vec_id < 65),
       |cand AS (SELECT q.query_id, c.vec_id,
       |    CAST(floor(list_dot_product(c.cv, q.qv)
       |      / sqrt(list_dot_product(c.cv, c.cv)
       |             * list_dot_product(q.qv, q.qv))
       |      * 1000000 + 0.5) AS BIGINT) AS simqu
       |  FROM q, c),
       |pairs AS (SELECT a.vec_id AS a, b.vec_id AS b,
       |    CAST(floor(list_dot_product(a.cv, b.cv)
       |      / sqrt(list_dot_product(a.cv, a.cv)
       |             * list_dot_product(b.cv, b.cv))
       |      * 1000000 + 0.5) AS BIGINT) AS csu
       |  FROM c a JOIN c b ON a.vec_id <> b.vec_id),
       |sel1 AS (SELECT query_id, vec_id, 3 * simqu AS score_u, 1 AS pick
       |  FROM (
       |    SELECT query_id, vec_id, simqu,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY simqu DESC, vec_id) AS rn
       |    FROM cand) WHERE rn = 1),
       |$steps
       |SELECT query_id, pick, vec_id,
       |  CAST(score_u AS DOUBLE) / 4000000 AS score
       |FROM sel$k ORDER BY query_id, pick""".stripMargin
  }

  /** DuckDB replay of the average-hash image dedup: pixel bytes from
    * the payload (the PGM raster = the first 16·(len div 16) text
    * bytes), integer mean, one generated CASE term per hash bit (the
    * 2^i literals come from the same 1L<<i the Spark kernel shifts),
    * then plain all-pairs hamming ≤ 3 — the 4-band join is
    * recall-lossless there, so bands need no replay.
    */
  private val phashSql: String = {
    def half(off: Int): String = (0 until 32).map { i =>
      s"CASE WHEN n > ${off + i} AND pl[${off + i + 1}] >= mean THEN ${1L << i} ELSE 0 END"
    }.mkString("\n      + ")
    s"""WITH t AS (SELECT doc_id AS media_id, text,
       |    octet_length(encode(text)) AS len FROM documents
       |  WHERE doc_id % 3 = 0),
       |b AS (SELECT media_id, text, 16 * (len // 16) AS n FROM t
       |  WHERE 16 * (len // 16) > 0),
       |px AS (SELECT media_id, n,
       |    list_transform(split(substr(text, 1, n), ''), c -> ord(c)) AS pl
       |  FROM b),
       |m AS (SELECT media_id, n, pl,
       |    CAST(list_sum(pl) // n AS BIGINT) AS mean FROM px),
       |h AS MATERIALIZED (SELECT media_id,
       |    CAST(${half(0)} AS BIGINT) AS lo,
       |    CAST(${half(32)} AS BIGINT) AS hi
       |  FROM m),
       |pr AS (SELECT a.media_id AS a_id, b.media_id AS b_id
       |  FROM h a JOIN h b ON a.media_id < b.media_id
       |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3),
       |cnt AS (SELECT media_id, COUNT(*) AS n FROM (
       |    SELECT a_id AS media_id FROM pr
       |    UNION ALL SELECT b_id FROM pr) GROUP BY 1)
       |SELECT h.media_id, h.lo AS ahash_lo, h.hi AS ahash_hi,
       |  CAST(bit_count(h.lo) + bit_count(h.hi) AS INT) AS nbits,
       |  CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_neardup
       |FROM h LEFT JOIN cnt USING (media_id)
       |ORDER BY media_id""".stripMargin
  }

  /** DuckDB replay of kcenterSelect: 8 greedy farthest-point rounds
    * unrolled as CTEs — per round, fold the newest center's quantized
    * micro-cosine into each point's running max, then argmin by
    * (maxsim, vec_id) over the unpicked. One template generates both
    * the state and pick CTEs so the two engines cannot drift.
    */
  private val kcenterSql: String = {
    val k = 8
    val sim =
      """CAST(floor(list_dot_product(p.v, cv.v)
        |      / sqrt(list_dot_product(p.v, p.v)
        |             * list_dot_product(cv.v, cv.v))
        |      * 1000000 + 0.5) AS BIGINT)""".stripMargin
    val rounds = (2 to k).map { t =>
      s"""st$t AS MATERIALIZED (
         |  SELECT p.vec_id, greatest(s.ms, $sim) AS ms
         |  FROM st${t - 1} s JOIN p ON p.vec_id = s.vec_id
         |  CROSS JOIN (SELECT v FROM p JOIN pick${t - 1} pk
         |    ON p.vec_id = pk.vec_id) cv),
         |pick$t AS MATERIALIZED (
         |  SELECT $t AS pick, vec_id, ms AS far_u FROM st$t
         |  WHERE vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  ORDER BY ms, vec_id LIMIT 1),
         |sel$t AS (SELECT vec_id FROM sel${t - 1}
         |  UNION ALL SELECT vec_id FROM pick$t)""".stripMargin
    }.mkString(",\n")
    val picks = (1 to k)
      .map(t => s"SELECT pick, vec_id, far_u FROM pick$t")
      .mkString("\n  UNION ALL ")
    s"""WITH p AS MATERIALIZED (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> floor(x * 1000000 + 0.5)) AS v
       |  FROM embeddings),
       |pick1 AS (SELECT 1 AS pick, MIN(vec_id) AS vec_id,
       |  CAST(-1000000 AS BIGINT) AS far_u FROM p),
       |sel1 AS (SELECT vec_id FROM pick1),
       |st1 AS (SELECT vec_id, CAST(-1000000 AS BIGINT) AS ms FROM p),
       |$rounds
       |SELECT * FROM ($picks) ORDER BY pick""".stripMargin
  }

  private val ivfPqTopkSql: String = {
    val nSub = 8; val dsub = 8; val ksub = 16; val k = 3; val nq = 20
    val rerank = 10; val nCent = 8; val nprobe = 2
    s"""WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < $nCent),
       |ca AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |      c.cv), 6) DESC, c.cid ASC) AS rn
       |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |qa AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |      c.cv), 6) DESC, c.cid ASC) AS rn
       |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < $nq) WHERE rn <= $nprobe),
       |cb AS (SELECT m.m, e.vec_id AS j,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$dsub+1 : m.m*$dsub+$dsub] AS sv
       |  FROM embeddings e CROSS JOIN (SELECT unnest(range($nSub)) AS m) m
       |  WHERE e.vec_id < $ksub),
       |codes AS (SELECT vec_id, m, j AS code FROM (
       |  SELECT e.vec_id, cb.m, cb.j, ROW_NUMBER() OVER (
       |      PARTITION BY e.vec_id, cb.m
       |      ORDER BY CAST(floor(list_dot_product(
       |        (CAST(e.embedding AS DOUBLE[]))[cb.m*$dsub+1 : cb.m*$dsub+$dsub],
       |        cb.sv) * 1000000 + 0.5) AS BIGINT) DESC, cb.j ASC) AS rn
       |  FROM embeddings e CROSS JOIN cb) WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, cb.m, cb.j,
       |    CAST(floor(list_dot_product(
       |      (CAST(q.embedding AS DOUBLE[]))[cb.m*$dsub+1 : cb.m*$dsub+$dsub],
       |      cb.sv) * 1000000 + 0.5) AS BIGINT) AS pd
       |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < $nq),
       |approx AS (SELECT q.query_id, c2.vec_id, SUM(l.pd) AS approx
       |  FROM qa q JOIN ca c2 ON c2.cell = q.cell
       |  JOIN codes cd ON cd.vec_id = c2.vec_id
       |  JOIN lut l ON l.query_id = q.query_id AND l.m = cd.m AND l.j = cd.code
       |  WHERE c2.vec_id <> q.query_id
       |  GROUP BY q.query_id, c2.vec_id),
       |cand AS (SELECT query_id, vec_id FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, vec_id ASC) AS arank FROM approx)
       |  WHERE arank <= $rerank),
       |scored AS (SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]),
       |                                 CAST(qe.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand c
       |  JOIN embeddings ce ON ce.vec_id = c.vec_id
       |  JOIN embeddings qe ON qe.vec_id = c.query_id)
       |SELECT query_id, rank, vec_id, cosine FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored
       |) WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB replay of e9: the e3/e7 seeded-cell assignment, then the
    * ∃-smaller-id within-cell prune at round-6 cosine ≥ τ. The shard
    * salt in Similarity.semdedupPrune stays at 1 while the largest
    * cell is under maxCellSize (holds at every verified SF by orders
    * of magnitude), so the oracle replays the unsharded rule.
    */
  private val semdedupSql: String =
    """WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |ca AS (SELECT vec_id, cell, v FROM (
      |  SELECT e.vec_id, c.cid AS cell, CAST(e.embedding AS DOUBLE[]) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |        c.cv), 6) DESC, c.cid ASC) AS rn
      |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1)
      |SELECT cell, vec_id, pruned_by, max_cos FROM (
      |  SELECT a.cell, b.vec_id, MIN(a.vec_id) AS pruned_by,
      |    MAX(round(list_cosine_similarity(a.v, b.v), 6)) AS max_cos
      |  FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.2
      |  GROUP BY a.cell, b.vec_id)
      |ORDER BY cell, vec_id""".stripMargin

  private val simhashSql: String = {
    val votes = (0 until 60).map { j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j"
    }.mkString(", ")
    val bits = (0 until 60).map { j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tok AS (SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t
       |    FROM documents)),
       |h AS (SELECT doc_id,
       |    CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM v ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "e2_lsh_topk" -> lshTopkSql,
    "e3_ivf_topk" -> ivfTopkSql,
    "e8_pq_topk" -> pqTopkSql,
    "e9_semdedup_prune" -> semdedupSql,
    "e10_ivfpq_topk" -> ivfPqTopkSql,
    "e11_mmr" -> mmrSql,
    "e14_kcenter" -> kcenterSql,
    // the e3 cell-assignment CTE joined onto document metadata
    "e7_cluster_profile" ->
      """WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |ca AS (SELECT vec_id, cid AS cell FROM (
        |  SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |    ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      c.cv), 6) DESC, c.cid ASC) AS rn
        |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1)
        |SELECT cell, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
        |  MIN(ca.vec_id) AS min_doc
        |FROM ca JOIN documents d ON d.doc_id = ca.vec_id
        |GROUP BY cell ORDER BY cell""".stripMargin,
    "d5_minhash_pairs" -> minhashSql,
    "d6_simhash_sigs" -> simhashSql,
    "d27_simhash_pairs" ->
      s"""WITH sigs AS (SELECT doc_id, simhash FROM ($simhashSql))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,
    // d37 = the m=2 sized-banding physical path; recall is lossless by
    // pigeonhole at EVERY subset size, so the oracle is the identical
    // all-pairs hamming replay — the knob never moves the output
    "d37_simhash_sized" ->
      s"""WITH sigs AS (SELECT doc_id, simhash FROM ($simhashSql))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY a_id, b_id""".stripMargin,
    "d14_rarity_score" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(text, '\s+')) AS t FROM documents),
        |freq AS (SELECT t, COUNT(*) AS tf FROM tok GROUP BY t),
        |tot AS (SELECT COUNT(*) AS total FROM tok)
        |SELECT doc_id, CAST(SUM(total // tf) AS BIGINT) AS rarity,
        |  COUNT(*) AS n_tokens,
        |  round(COUNT(DISTINCT t) / CAST(COUNT(*) AS DOUBLE), 6) AS distinct_ratio
        |FROM tok JOIN freq USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d15_repetition" ->
      """WITH tk AS (SELECT doc_id,
        |    string_split_regex(text, '\s+') AS tk FROM documents),
        |g1 AS (SELECT doc_id, unnest(tk) AS gram FROM tk),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 1),
        |    i -> array_to_string(tk[i+1:i+2], ' '))) AS gram FROM tk),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
        |    i -> array_to_string(tk[i+1:i+3], ' '))) AS gram FROM tk),
        |f1 AS (SELECT doc_id, round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS fr
        |  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g1 GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |f2 AS (SELECT doc_id, round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS fr
        |  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |f3 AS (SELECT doc_id, round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS fr
        |  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(f1.fr, 0.0) AS top1_frac,
        |  COALESCE(f2.fr, 0.0) AS top2_frac,
        |  COALESCE(f3.fr, 0.0) AS top3_frac,
        |  (COALESCE(f1.fr, 0.0) >= 0.3 OR COALESCE(f2.fr, 0.0) >= 0.2
        |    OR COALESCE(f3.fr, 0.0) >= 0.18) AS repetitive
        |FROM documents d
        |LEFT JOIN f1 ON f1.doc_id = d.doc_id
        |LEFT JOIN f2 ON f2.doc_id = d.doc_id
        |LEFT JOIN f3 ON f3.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "e6_dim_stats" ->
      """SELECT CAST(i AS INT) AS pos, COUNT(*) AS n_vecs,
        |  CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000000 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS sum_micro,
        |  MIN(CAST(embedding[i+1] AS DOUBLE)) AS min_val,
        |  MAX(CAST(embedding[i+1] AS DOUBLE)) AS max_val,
        |  round(CAST(SUM(CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000000
        |      + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_val
        |FROM embeddings, unnest(range(len(embedding))) AS u(i)
        |GROUP BY i ORDER BY pos""".stripMargin,
    // winnowing replay: grams via lead() (concat_ws skips the null
    // tail, giving the same short-doc fallback gram), 40-bit md5 gram
    // hash, window argmin as MIN(h*2^20 + gram_idx); the SUM is cast
    // back to BIGINT (HUGEINT surfaces as decimal128 in Arrow and
    // hash-mismatches on the driver — the d12 lesson)
    "d18_fingerprints" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(text, '\s+')) AS t,
        |    generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        |  FROM documents),
        |gr AS (SELECT doc_id, pos,
        |    concat_ws(' ', t,
        |      lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos),
        |      lead(t, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS s,
        |    lead(t, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
        |      AS keep2
        |  FROM tok),
        |g AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS gi,
        |    CAST(concat('0x', substr(md5(s), 1, 10)) AS BIGINT) AS h
        |  FROM gr WHERE keep2 OR pos = 1),
        |sel AS (SELECT doc_id, gi,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
        |    MIN(h * 1048576 + gi) OVER (PARTITION BY doc_id ORDER BY gi
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS hp
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, n_grams, hp FROM sel
        |  WHERE gi <= greatest(n_grams - 4, 0))
        |SELECT doc_id, MAX(n_grams) AS n_grams, COUNT(*) AS n_fps,
        |  CAST(SUM(hp // 1048576) AS BIGINT) AS fp_sum,
        |  MIN(hp // 1048576) AS fp_min, MAX(hp // 1048576) AS fp_max
        |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // winnowing replay (the d18 CTEs) for both parity halves, then the
    // fingerprint-hash inverted-index join and the >= 5 shared gate
    "d28_copy_detect" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(text, '\s+')) AS t,
        |    generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        |  FROM documents),
        |gr AS (SELECT doc_id, pos,
        |    concat_ws(' ', t,
        |      lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos),
        |      lead(t, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS s,
        |    lead(t, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
        |      AS keep2
        |  FROM tok),
        |g AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS gi,
        |    CAST(concat('0x', substr(md5(s), 1, 10)) AS BIGINT) AS h
        |  FROM gr WHERE keep2 OR pos = 1),
        |sel AS (SELECT doc_id, gi,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
        |    MIN(h * 1048576 + gi) OVER (PARTITION BY doc_id ORDER BY gi
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS hp
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, hp // 1048576 AS h FROM sel
        |  WHERE gi <= greatest(n_grams - 4, 0))
        |SELECT a_id, b_id, n_shared FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
        |  FROM fp a JOIN fp b ON a.h = b.h
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  GROUP BY 1, 2)
        |WHERE n_shared >= 5 ORDER BY a_id, b_id""".stripMargin,
    // same exploded pass: bigram counts + per-context counts, one
    // correctly-rounded division on the top-k frame
    "d26_lm_surprise" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(coalesce(text, ''), '\s+')) AS t,
        |    generate_subscripts(string_split_regex(coalesce(text, ''),
        |      '\s+'), 1) AS pos
        |  FROM documents),
        |p AS (SELECT doc_id, t AS w1,
        |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM tok),
        |bi AS (SELECT doc_id, w1, w2 FROM p WHERE w2 IS NOT NULL),
        |nb AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bi GROUP BY w1, w2),
        |nc AS (SELECT w1, COUNT(*) AS n_context FROM bi GROUP BY w1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  round(AVG(-ln(CAST(n_bigram AS DOUBLE)
        |    / CAST(n_context AS DOUBLE))), 6) AS avg_nll
        |FROM bi JOIN nb USING (w1, w2) JOIN nc USING (w1)
        |GROUP BY doc_id
        |ORDER BY avg_nll DESC, doc_id LIMIT 15""".stripMargin,
    "d23_bigram_lm" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(coalesce(text, ''), '\s+')) AS t,
        |    generate_subscripts(string_split_regex(coalesce(text, ''),
        |      '\s+'), 1) AS pos
        |  FROM documents),
        |p AS (SELECT t AS w1,
        |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM tok),
        |big AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM p
        |  WHERE w2 IS NOT NULL GROUP BY w1, w2),
        |ctx AS (SELECT w1, COUNT(*) AS n_context FROM p
        |  WHERE w2 IS NOT NULL GROUP BY w1)
        |SELECT b.w1, b.w2, b.n_bigram, c.n_context,
        |  round(CAST(b.n_bigram AS DOUBLE) / CAST(c.n_context AS DOUBLE), 6)
        |    AS p_cond
        |FROM big b JOIN ctx c USING (w1)
        |ORDER BY n_bigram DESC, w1, w2 LIMIT 20""".stripMargin,
    // lead() pair assembly; the NULL next-token at doc end drops the
    // row on both sides
    // the d22 top-1 CTE + gaps-and-islands greedy merge. Spark's pos
    // is 0-based, generate_subscripts 1-based — a per-doc constant
    // shift that cancels in (pos − row_number) groups and
    // (pos − run_start) parities.
    "d29_bpe_apply" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(coalesce(text, ''), '\s+')) AS t,
        |    generate_subscripts(string_split_regex(coalesce(text, ''),
        |      '\s+'), 1) AS pos
        |  FROM documents),
        |lk AS (SELECT doc_id, pos, t,
        |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |  FROM tok),
        |top1 AS (SELECT pair FROM (
        |  SELECT t || ' ' || nxt AS pair, COUNT(*) AS n FROM lk
        |  WHERE nxt IS NOT NULL GROUP BY pair
        |  ORDER BY n DESC, pair LIMIT 1)),
        |fl AS (SELECT lk.doc_id, lk.pos FROM lk, top1
        |  WHERE lk.t || ' ' || lk.nxt = top1.pair),
        |runs AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM fl),
        |m AS (SELECT doc_id, COUNT(*) AS n_merges FROM (
        |    SELECT doc_id, pos,
        |      min(pos) OVER (PARTITION BY doc_id, grp) AS run_start
        |    FROM runs) WHERE (pos - run_start) % 2 = 0 GROUP BY doc_id),
        |sz AS (SELECT doc_id, COUNT(*) AS n_before FROM tok GROUP BY doc_id)
        |SELECT sz.doc_id AS doc_id, n_before, n_merges,
        |  n_before - n_merges AS n_after
        |FROM sz JOIN m ON m.doc_id = sz.doc_id ORDER BY sz.doc_id""".stripMargin,
    "d22_bpe_pairs" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(coalesce(text, ''), '\s+')) AS t,
        |    generate_subscripts(string_split_regex(coalesce(text, ''),
        |      '\s+'), 1) AS pos
        |  FROM documents),
        |p AS (SELECT t || ' ' ||
        |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS pair
        |  FROM tok)
        |SELECT pair, COUNT(*) AS n FROM p WHERE pair IS NOT NULL
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // micro-unit sqrt weights; BIGINT total (cast back from HUGEINT)
    "d21_lang_mix" ->
      """WITH p AS (SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS tokens
        |  FROM documents GROUP BY lang),
        |w AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000
        |    + 0.5) AS BIGINT) AS w FROM p),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM w)
        |SELECT lang, n_docs, tokens,
        |  round(CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS mix_share
        |FROM w, t ORDER BY lang""".stripMargin,
    // Morton replay, generated from the same bit loop as Layout.zValue
    // (disjoint bit positions make interleave a sum of shifted bits)
    "d20_zorder" -> {
      val terms = (0 until 16).map { i =>
        s"((x // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
          s"((y // ${1L << i}) % 2) * ${1L << (2 * i)}"
      }.mkString(" + ")
      s"""WITH b AS (SELECT l_partkey % 65536 AS x,
         |    l_suppkey % 65536 AS y FROM lineitem),
         |zt AS (SELECT CAST($terms AS BIGINT) AS z FROM b)
         |SELECT z // 16384 AS z_cell, COUNT(*) AS n,
         |  MIN(z) AS z_min, MAX(z) AS z_max
         |FROM zt GROUP BY 1 ORDER BY z_cell""".stripMargin
    },
    // segment dedup replay: aligned 10-token segments via 9 window
    // leads (concat_ws skips the null tail — slice-clamp semantics),
    // doc-frequency on the segment text (Spark groups the md5 digest
    // of the same string — identical partition), keep = df <= 1
    "d19_segment_dedup" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split_regex(coalesce(text, ''), '\s+')) AS t,
        |    generate_subscripts(string_split_regex(coalesce(text, ''),
        |      '\s+'), 1) - 1 AS pos
        |  FROM documents),
        |segs AS (SELECT doc_id, pos // 10 AS seg_idx,
        |    concat_ws(' ', t,
        |      lead(t, 1) OVER w, lead(t, 2) OVER w, lead(t, 3) OVER w,
        |      lead(t, 4) OVER w, lead(t, 5) OVER w, lead(t, 6) OVER w,
        |      lead(t, 7) OVER w, lead(t, 8) OVER w, lead(t, 9) OVER w)
        |      AS seg
        |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY pos % 10 = 0),
        |df AS (SELECT seg, COUNT(DISTINCT doc_id) AS n_docs
        |  FROM segs GROUP BY seg)
        |SELECT s.doc_id, COUNT(*) AS n_segments,
        |  CAST(SUM(CASE WHEN f.n_docs <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(coalesce(SUM(CASE WHEN f.n_docs <= 1
        |    THEN length(s.seg) END), 0) AS BIGINT) AS kept_chars
        |FROM segs s JOIN df f USING (seg)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "d17_contamination" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS bk
        |  FROM documents),
        |lab AS (SELECT doc_id,
        |    CASE WHEN bk < 52429 THEN 'train' WHEN bk < 58983 THEN 'val'
        |         ELSE 'test' END AS split,
        |    string_split_regex(text, '\s+') AS tk FROM b),
        |sh AS (SELECT doc_id, split,
        |    unnest(CASE WHEN len(tk) >= 3
        |      THEN list_distinct(list_transform(range(len(tk) - 2),
        |           i -> array_to_string(tk[i+1:i+3], ' ')))
        |      ELSE [array_to_string(tk, ' ')] END) AS s
        |  FROM lab),
        |ev AS (SELECT DISTINCT s FROM sh WHERE split = 'test'),
        |tr AS (SELECT doc_id, s FROM sh WHERE split = 'train'),
        |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, COUNT(*) AS n_shared
        |  FROM tr JOIN ev USING (s) GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams,
        |  CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  round(COALESCE(h.n_shared, 0) / CAST(t.n_grams AS DOUBLE), 6)
        |    AS shared_ratio,
        |  round(COALESCE(h.n_shared, 0) / CAST(t.n_grams AS DOUBLE), 6) >= 0.2
        |    AS contaminated
        |FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "d16_sliding_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens, i // 64 AS chunk_id, i AS chunk_start,
        |  least(128, n_tokens - i) AS chunk_len
        |FROM t, unnest(generate_series(0, n_tokens - 1, 64)) AS u(i)
        |WHERE n_tokens > 0
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "d3_langid_dist" ->
      s"""$langIdSql
         |SELECT lang_pred, COUNT(*) AS n FROM pred
         |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    // every branch replays a REAL container decode: image = the PGM
    // pixel walk (raster = first 16·(len div 16) payload bytes), audio
    // = the WAV sample walk (samples = the full payload, 10 ms frames
    // at the fmt chunk's 16 kHz), video = the Y4M frame walk (raster =
    // first 64·(len div 64) payload bytes, 8×8 frames). In all three
    // the decoded content starts at payload byte 1, so checksum/mean
    // share one expression; text is ASCII, so ord(char) == byte value
    "m2_media_features" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS k, text,
        |    octet_length(encode(text)) AS len FROM documents),
        |b AS (SELECT doc_id, k, text, len,
        |    CASE WHEN k = 0 THEN 16 * (len // 16)
        |         WHEN k = 2 THEN 64 * (len // 64)
        |         ELSE len END AS n
        |  FROM t)
        |SELECT doc_id AS media_id,
        |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS kind,
        |  CAST(CASE k WHEN 0 THEN 16 WHEN 2 THEN 8 ELSE 0 END AS INT)
        |    AS width,
        |  CAST(CASE k WHEN 0 THEN len // 16 WHEN 2 THEN 8 ELSE 0 END
        |    AS INT) AS height,
        |  CAST(n AS BIGINT) AS n_bytes,
        |  lower(substr(hex(substr(text, 1, n)), 1, 16)) AS checksum,
        |  round(CASE WHEN n > 0 THEN
        |      list_sum(list_transform(split(substr(text, 1, n), ''),
        |        c -> ord(c))) / CAST(n AS DOUBLE)
        |    ELSE 0.0 END, 6) AS mean_byte,
        |  CAST(CASE k WHEN 2 THEN len // 64 WHEN 1 THEN len // 160
        |    ELSE 1 END AS INT) AS n_frames
        |FROM b ORDER BY media_id""".stripMargin,
    "p5_balanced_corpus" ->
      """WITH keep AS (SELECT MIN(doc_id) AS doc_id
        |  FROM documents GROUP BY md5(text)),
        |surv AS (SELECT d.source, d.doc_id FROM documents d
        |  JOIN keep USING (doc_id)),
        |capped AS (SELECT doc_id FROM (
        |  SELECT doc_id, ROW_NUMBER() OVER
        |    (PARTITION BY source ORDER BY doc_id) AS rn FROM surv)
        |  WHERE rn <= 10)
        |SELECT d.source, d.lang, CAST(COUNT(*) AS BIGINT) AS n_raw,
        |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dedup,
        |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_capped
        |FROM documents d
        |LEFT JOIN keep k ON k.doc_id = d.doc_id
        |LEFT JOIN capped c ON c.doc_id = d.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // e9's cell/prune CTEs + p1's quality fragment + e7's report shape
    "p4_semantic_curation" ->
      s"""WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id < 8),
         |ca AS (SELECT vec_id, cell, v FROM (
         |  SELECT e.vec_id, c.cid AS cell, CAST(e.embedding AS DOUBLE[]) AS v,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
         |        c.cv), 6) DESC, c.cid ASC) AS rn
         |  FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |pr AS (SELECT DISTINCT b.vec_id FROM ca a
         |  JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.2),
         |kept AS (SELECT ca.vec_id, ca.cell FROM ca
         |  LEFT JOIN pr ON pr.vec_id = ca.vec_id WHERE pr.vec_id IS NULL),
         |scored AS (
         |  SELECT doc_id AS vec_id, lang,
         |    round(least(len($tokensSql) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[.!?,;:]'))
         |          / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0)) * 5.0) * 0.3
         |      + least(len(list_filter($tokensSql, t -> list_contains($stopListSql, t)))
         |          / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
         |      6) AS quality,
         |    len($tokensSql) AS n_tokens
         |  FROM documents)
         |SELECT cell, COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CAST(ROUND(quality*1000000) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / COUNT(*) AS avg_quality
         |FROM kept JOIN scored USING (vec_id)
         |WHERE quality >= 0.5
         |GROUP BY cell ORDER BY cell""".stripMargin,
    "p1_corpus_curation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    round(least(len($tokensSql) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[.!?,;:]'))
         |          / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0)) * 5.0) * 0.3
         |      + least(len(list_filter($tokensSql, t -> list_contains($stopListSql, t)))
         |          / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
         |      6) AS quality,
         |    $fingerprintSql AS fingerprint,
         |    len($tokensSql) AS n_tokens
         |  FROM documents),
         |gated AS (SELECT * FROM scored WHERE quality >= 0.5),
         |winners AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM gated
         |            GROUP BY fingerprint),
         |kept AS (SELECT g.* FROM gated g JOIN winners w
         |         ON g.fingerprint = w.fingerprint AND g.doc_id = w.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CAST(ROUND(quality*1000000) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / COUNT(*) AS avg_quality
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // p1's quality gate + d19's segment CTEs (over the GATED corpus,
    // matching the Spark plan) + d21's sqrt micro-unit weights
    "p3_pretrain_mix" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text,
         |      round(least(len($tokensSql) / 50.0, 1.0) * 0.4
         |        + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[.!?,;:]'))
         |            / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0)) * 5.0) * 0.3
         |        + least(len(list_filter($tokensSql, t -> list_contains($stopListSql, t)))
         |            / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
         |        6) AS quality
         |    FROM documents) WHERE quality >= 0.5),
         |tok AS (SELECT doc_id,
         |    unnest(string_split_regex(coalesce(text, ''), '\\s+')) AS t,
         |    generate_subscripts(string_split_regex(coalesce(text, ''),
         |      '\\s+'), 1) - 1 AS pos
         |  FROM gated),
         |segs AS (SELECT doc_id,
         |    concat_ws(' ', t,
         |      lead(t, 1) OVER w, lead(t, 2) OVER w, lead(t, 3) OVER w,
         |      lead(t, 4) OVER w, lead(t, 5) OVER w, lead(t, 6) OVER w,
         |      lead(t, 7) OVER w, lead(t, 8) OVER w, lead(t, 9) OVER w)
         |      AS seg
         |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY pos % 10 = 0),
         |fr AS (SELECT seg, COUNT(DISTINCT doc_id) AS n_docs
         |  FROM segs GROUP BY seg),
         |perdoc AS (SELECT s.doc_id, COUNT(*) AS n_segments,
         |    SUM(CASE WHEN f.n_docs <= 1 THEN 1 ELSE 0 END) AS n_kept,
         |    coalesce(SUM(CASE WHEN f.n_docs <= 1
         |      THEN length(s.seg) END), 0) AS kept_chars
         |  FROM segs s JOIN fr f USING (seg) GROUP BY s.doc_id),
         |wl AS (SELECT p.*, g.lang FROM perdoc p JOIN gated g USING (doc_id)),
         |perlang AS (SELECT lang, COUNT(*) AS n_docs,
         |    CAST(SUM(n_segments) AS BIGINT) AS segments,
         |    CAST(SUM(n_kept) AS BIGINT) AS kept_segments,
         |    CAST(SUM(kept_chars) AS BIGINT) AS clean_chars
         |  FROM wl GROUP BY lang),
         |wt AS (SELECT *, CAST(floor(sqrt(CAST(clean_chars AS DOUBLE))
         |    * 1000000 + 0.5) AS BIGINT) AS w FROM perlang),
         |tt AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM wt)
         |SELECT lang, n_docs, segments, kept_segments, clean_chars,
         |  round(CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS mix_share
         |FROM wt, tt ORDER BY lang""".stripMargin,
    "d1_exact_dedup" ->
      s"""SELECT $fingerprintSql AS fingerprint, MIN(doc_id) AS keep_id,
         |  COUNT(*) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,
    "m8_phash" -> phashSql,
    // WAV decode replay: audio rows (doc_id%3=1), rate 16000 from the
    // fmt chunk the builder wrote, per-sample integer stats over the
    // payload (text is ASCII so ord(char) == byte value)
    "m6_audio" ->
      """WITH a AS (SELECT doc_id, text, octet_length(encode(text)) AS n
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 1)
        |SELECT doc_id AS media_id, CAST(16000 AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_min(list_transform(split(text, ''), c -> ord(c)))
        |    AS INT) AS amp_min,
        |  CAST(list_max(list_transform(split(text, ''), c -> ord(c)))
        |    AS INT) AS amp_max,
        |  CAST(list_sum(list_transform(split(text, ''), c -> ord(c)))
        |    AS BIGINT) AS amp_sum,
        |  CAST(len(list_filter(range(2, n + 1),
        |    i -> (ord(split(text, '')[i-1]) >= 100)
        |      <> (ord(split(text, '')[i]) >= 100))) AS BIGINT) AS crossings
        |FROM a ORDER BY media_id""".stripMargin,
    // Y4M decode replay: video rows (doc_id%3=2), fixed 8×8 mono
    // frames the builder wrote (64·(len div 64) raster bytes), integer
    // per-pixel stats + Σ|ΔframeSum| motion between consecutive frames
    "m7_video" ->
      """WITH v AS (SELECT doc_id, split(text, '') AS cs,
        |    octet_length(encode(text)) // 64 AS nf
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |f AS (SELECT doc_id, nf,
        |    list_transform(range(0, CAST(nf AS INT)), fr ->
        |      list_sum(list_transform(range(CAST(fr * 64 + 1 AS INT),
        |        CAST(fr * 64 + 65 AS INT)), i -> ord(cs[i])))) AS fsums,
        |    CASE WHEN nf > 0 THEN list_min(list_transform(
        |      cs[1 : CAST(64 * nf AS INT)], c -> ord(c))) ELSE 0 END AS lmin,
        |    CASE WHEN nf > 0 THEN list_max(list_transform(
        |      cs[1 : CAST(64 * nf AS INT)], c -> ord(c))) ELSE 0 END AS lmax
        |  FROM v)
        |SELECT doc_id AS media_id, CAST(8 AS INT) AS width,
        |  CAST(8 AS INT) AS height, CAST(25 AS INT) AS fps_num,
        |  CAST(1 AS INT) AS fps_den, CAST(nf AS INT) AS n_frames,
        |  CAST(lmin AS INT) AS luma_min, CAST(lmax AS INT) AS luma_max,
        |  CAST(COALESCE(list_sum(fsums), 0) AS BIGINT) AS luma_sum,
        |  CAST(COALESCE(list_sum(list_transform(range(2, CAST(nf + 1 AS INT)),
        |    fr -> abs(fsums[fr] - fsums[fr - 1]))), 0) AS BIGINT) AS motion
        |FROM f ORDER BY media_id""".stripMargin,
    // DSIR replay: same md5-prefix bucket hash, add-one smoothing,
    // ppm normalization and integer divisions as dsirScores
    "d32_dsir" ->
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(string_split_regex(text, '\s+')) AS t,
        |    generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
        |  FROM documents),
        |bg AS (SELECT doc_id, lang,
        |    concat_ws(' ', t,
        |      lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos)) AS s,
        |    lead(t, 1) OVER (PARTITION BY doc_id ORDER BY pos)
        |      IS NOT NULL AS keep
        |  FROM tok),
        |b AS (SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % 64 AS bkt
        |  FROM bg WHERE keep),
        |c AS (SELECT doc_id, lang, bkt, COUNT(*) AS c
        |  FROM b GROUP BY 1, 2, 3),
        |pb AS (SELECT bkt,
        |    SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS tc,
        |    SUM(c) AS rc FROM c GROUP BY bkt),
        |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM pb),
        |w AS (SELECT bkt,
        |    ((tc + 1) * 1000000) // (tt + 64) AS tppm,
        |    ((rc + 1) * 1000000) // (rt + 64) AS rppm
        |  FROM pb, tot)
        |SELECT c.doc_id, CAST(SUM(c.c) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(c.c * ((w.tppm * 10000) // greatest(w.rppm, 1)))
        |    AS BIGINT) AS score
        |FROM c JOIN w USING (bkt) GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin,
    // Gopher rules: same integer cross-multiplied thresholds per rule
    "d31_gopher" ->
      s"""WITH f AS (SELECT doc_id,
         |    len($tokensSql) AS n_tok,
         |    length(regexp_replace(text, '\\s+', '', 'g')) AS chars,
         |    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym,
         |    len(string_split(text, chr(10))) AS n_lines,
         |    len(list_filter(string_split(text, chr(10)),
         |      l -> l LIKE '%...')) AS n_ell,
         |    len(list_filter(string_split(text, chr(10)),
         |      l -> l LIKE '-%' OR l LIKE '•%')) AS n_bullet,
         |    len(list_filter($tokensSql,
         |      t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
         |    len(list_intersect(list_distinct($tokensSql),
         |      $stopListSql)) AS n_stop
         |  FROM documents)
         |SELECT doc_id,
         |  n_tok >= 50 AND n_tok <= 100000 AS r_word_count,
         |  chars >= n_tok * 3 AND chars <= n_tok * 10 AS r_mean_word_len,
         |  n_sym * 10 < n_tok AS r_symbol_ratio,
         |  n_ell * 10 <= n_lines * 3 AS r_ellipsis_lines,
         |  n_bullet * 10 <= n_lines * 9 AS r_bullet_lines,
         |  n_alpha * 5 >= n_tok * 4 AS r_alpha_words,
         |  n_stop >= 2 AS r_stopwords,
         |  (n_tok >= 50 AND n_tok <= 100000)
         |    AND (chars >= n_tok * 3 AND chars <= n_tok * 10)
         |    AND (n_sym * 10 < n_tok) AND (n_ell * 10 <= n_lines * 3)
         |    AND (n_bullet * 10 <= n_lines * 9)
         |    AND (n_alpha * 5 >= n_tok * 4) AND (n_stop >= 2) AS pass
         |FROM f ORDER BY doc_id""".stripMargin,
    "d33_quality_lr" ->
      s"""WITH f AS (SELECT doc_id, source, lang,
         |    CAST(len($tokensSql) AS BIGINT) AS ntok,
         |    CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT)
         |      AS punct,
         |    CAST(len(list_filter($tokensSql,
         |      t -> list_contains($stopListSql, t))) AS BIGINT) AS stop,
         |    CAST(len(list_filter($tokensSql,
         |      t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS alpha
         |  FROM documents),
         |g AS (SELECT doc_id, source, lang, ntok,
         |    greatest(ntok, 1) AS n1, punct, stop, alpha FROM f)
         |SELECT doc_id, source, lang,
         |  CAST(-2000 + 15 * least(ntok, 200)
         |    - 30 * ((punct * 100) // n1)
         |    + 25 * ((stop * 100) // n1)
         |    + 10 * ((alpha * 100) // n1) AS BIGINT) AS logit,
         |  (-2000 + 15 * least(ntok, 200)
         |    - 30 * ((punct * 100) // n1)
         |    + 25 * ((stop * 100) // n1)
         |    + 10 * ((alpha * 100) // n1)) >= 0 AS pass
         |FROM g ORDER BY doc_id""".stripMargin,
    // BPE training replay, unrolled round-by-round from the SAME loop
    // shape as TextAnalysis.bpeTrain: vocab → char state → per round
    // (lead pairs → weighted argmax under the (n desc,lft,rgt) total
    // order → gaps-and-islands greedy merge → renumber). SUM(freq) is
    // cast back to BIGINT (DuckDB HUGEINT vs Spark LONG, the d12 trap).
    "d34_bpe_train" -> {
      val unions = (1 to BpeTrainRounds).map { r =>
        s"SELECT CAST($r AS INTEGER) AS merge_round, lft, rgt, n FROM top$r"
      }.mkString("\nUNION ALL ")
      s"""WITH $bpeChainSql
         |$unions
         |ORDER BY merge_round""".stripMargin
    },
    // the d34 chain's FINAL state s{rounds}, read out as per-word
    // symbol counts and expanded through the doc-token join
    "d35_bpe_tokenize" ->
      s"""WITH $bpeChainSql,
         |pw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sym
         |  FROM s$BpeTrainRounds GROUP BY word),
         |dt AS (SELECT doc_id, t AS word FROM (
         |    SELECT doc_id, unnest(string_split_regex(coalesce(text, ''),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> '')
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(len(word)) AS BIGINT) AS n_chars,
         |  CAST(SUM(n_sym) AS BIGINT) AS n_tokens
         |FROM dt JOIN pw USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the d35 learned-vocab token counts run through the d12 packer:
    // prefix sum in doc order, 192-token packs
    "p6_packed_tokens" ->
      s"""WITH $bpeChainSql,
         |pw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sym
         |  FROM s$BpeTrainRounds GROUP BY word),
         |dt AS (SELECT doc_id, t AS word FROM (
         |    SELECT doc_id, unnest(string_split_regex(coalesce(text, ''),
         |      '\\s+')) AS t FROM documents)
         |  WHERE t <> ''),
         |tc AS (SELECT doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_tokens
         |  FROM dt JOIN pw USING (word) GROUP BY doc_id),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start
         |  FROM tc)
         |SELECT doc_id, n_tokens,
         |  start // 192 AS pack_first,
         |  start % 192 AS pack_offset,
         |  (start + n_tokens - 1) // 192 - start // 192 + 1 AS n_packs
         |FROM c ORDER BY doc_id""".stripMargin,
    "d2_text_stats" ->
      s"""SELECT doc_id,
         |  len($tokensSql) AS n_tokens,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_bpeish,
         |  len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
         |  length(text) AS n_chars_measured,
         |  round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |        / len($tokensSql), 6) AS avg_token_len,
         |  len(list_filter($tokensSql, t -> list_contains($stopListSql, t)))
         |    AS n_stopwords,
         |  round(least(len($tokensSql) / 50.0, 1.0) * 0.4
         |    + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[.!?,;:]'))
         |        / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0)) * 5.0) * 0.3
         |    + least(len(list_filter($tokensSql, t -> list_contains($stopListSql, t)))
         |        / greatest(CAST(len($tokensSql) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3,
         |    6) AS quality,
         |  $fingerprintSql AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "d4_jaccard_pairs" ->
      """SELECT a_id, b_id, jaccard FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |  FROM (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS sh
        |        FROM documents WHERE doc_id < 60) a
        |  JOIN (SELECT doc_id, list_distinct(string_split_regex(text, '\s+')) AS sh
        |        FROM documents WHERE doc_id < 60) b
        |    ON a.doc_id < b.doc_id
        |) WHERE jaccard >= 0.3 ORDER BY a_id, b_id""".stripMargin,
    "d8_split_budget" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS bk
        |  FROM documents)
        |SELECT CASE WHEN bk < 52429 THEN 'train'
        |            WHEN bk < 58983 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "d7_shingle_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split_regex(text, '\s+')) >= 3
        |      THEN list_distinct(list_transform(
        |        range(len(string_split_regex(text, '\s+')) - 2),
        |        i -> array_to_string(string_split_regex(text, '\s+')[i+1:i+3], ' ')))
        |      ELSE [array_to_string(string_split_regex(text, '\s+'), ' ')]
        |    END AS sg
        |  FROM documents WHERE doc_id < 500)
        |SELECT a_id, b_id, jaccard FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    round(CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
        |          / len(list_distinct(list_concat(a.sg, b.sg))), 6) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |) WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin,
    "d12_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  start // 256 AS pack_first,
        |  start % 256 AS pack_offset,
        |  (start + n_tokens - 1) // 256 - start // 256 + 1 AS n_packs
        |FROM c ORDER BY doc_id""".stripMargin,
    "d13_stratified" ->
      """SELECT source, sample_rank, doc_id FROM (
        |  SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 10 ORDER BY source, sample_rank""".stripMargin,
    // k-means replay: identical milli quantization, integer distances
    // (DuckDB `//` and Spark `div` both truncate toward zero), seeds =
    // 4 smallest vec_ids, two unrolled update rounds + final assign
    // JL projection replay: per output dim j, Σ over components of
    // ±micro(x_i) with the sign from the SAME md5-prefix parity Spark
    // bakes into rprojSign's literal matrix (i is 0-based on both
    // sides; generate_subscripts is 1-based, hence i-1).
    "e15_rproj" -> {
      val dims = (0 until RprojK).map { j =>
        s"""  CAST(SUM(CASE WHEN CAST(concat('0x',
           |    substr(md5(CAST(i - 1 AS VARCHAR) || ':$j'), 1, 8))
           |    AS BIGINT) % 2 = 0 THEN qc ELSE -qc END) AS BIGINT)
           |    AS p$j""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id,
         |    list_transform(embedding, x ->
         |      CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
         |      AS qv
         |  FROM embeddings),
         |e AS (SELECT vec_id, unnest(qv) AS qc,
         |    generate_subscripts(qv, 1) AS i FROM q)
         |SELECT vec_id,
         |$dims
         |FROM e GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },
    "e13_kmeans" -> {
      def assignCte(name: String, cents: String) =
        s"""$name AS (SELECT vec_id, qv, cid, dist FROM (
           |    SELECT q.vec_id, q.qv, c.cid,
           |      list_sum(list_transform(range(1, 65),
           |        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_sum(list_transform(range(1, 65),
           |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))),
           |        c.cid) AS rn
           |    FROM q, $cents c) WHERE rn = 1)"""
      def updateCte(a: String, prev: String, next: String) =
        s"""${next}n AS (SELECT cid, list(m ORDER BY d) AS cv FROM (
           |    SELECT cid, d, SUM(x) // COUNT(*) AS m FROM (
           |      SELECT cid, unnest(qv) AS x,
           |        generate_subscripts(qv, 1) AS d FROM $a)
           |    GROUP BY cid, d) GROUP BY cid),
           |$next AS (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
           |  FROM $prev p LEFT JOIN ${next}n n USING (cid))"""
      s"""WITH q AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
         |      AS BIGINT) AS cid, qv AS cv
         |  FROM (SELECT * FROM q ORDER BY vec_id LIMIT 4)),
         |${assignCte("a1", "c0")},
         |${updateCte("a1", "c0", "c1")},
         |${assignCte("a2", "c1")},
         |${updateCte("a2", "c1", "c2")},
         |${assignCte("af", "c2")},
         |cs AS (SELECT cid, list_sum(cv) AS s FROM c2)
         |SELECT af.cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(cs.s AS BIGINT) AS coord_sum,
         |  CAST(SUM(af.dist) AS BIGINT) AS inertia
         |FROM af JOIN cs USING (cid)
         |GROUP BY af.cid, cs.s ORDER BY centroid_id""".stripMargin
    },
    // replays the integer power iteration literally: milli-quantized
    // Gram, one rescale to |g| <= 1e6, PcaIters max-abs-normalized
    // rounds — every CTE materialized (each is read twice per round)
    "e16_pca" ->
      s"""WITH $pcaChainSql
         |SELECT CAST(j AS BIGINT) AS dim, v AS weight FROM x$PcaIters
         |ORDER BY dim""".stripMargin,
    // the e16 chain's final direction projected OUT of each vector:
    // c = sign(q·w)·(1000·|q·w| // Σw²), residual r_i = 1000·q_i − c·w_i
    "e17_abtt" ->
      s"""WITH $pcaChainSql,
         |xx AS MATERIALIZED (SELECT GREATEST(SUM(v * v), 1) AS xx
         |  FROM x$PcaIters),
         |qv AS MATERIALIZED (SELECT vec_id,
         |    generate_subscripts(embedding, 1) - 1 AS dim,
         |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
         |      AS BIGINT) AS q
         |  FROM embeddings),
         |dt AS MATERIALIZED (SELECT vec_id,
         |    CAST(SUM(qv.q * x.v) AS BIGINT) AS dot
         |  FROM qv JOIN x$PcaIters x ON x.j = qv.dim GROUP BY vec_id),
         |cc AS MATERIALIZED (SELECT vec_id,
         |    CAST((CASE WHEN dot < 0 THEN -1 ELSE 1 END)
         |      * ((ABS(dot) * 1000) // (SELECT xx FROM xx)) AS BIGINT) AS c
         |  FROM dt)
         |SELECT qv.vec_id, cc.c,
         |  CAST(SUM(ABS(1000 * qv.q - cc.c * x.v)) AS BIGINT) AS l1_r,
         |  CAST(SUM((1000 * qv.q - cc.c * x.v) * (qv.dim + 1)) AS BIGINT)
         |    AS checksum
         |FROM qv JOIN cc USING (vec_id) JOIN x$PcaIters x ON x.j = qv.dim
         |GROUP BY qv.vec_id, cc.c ORDER BY qv.vec_id""".stripMargin,
    // suffix(k)=prefix(k) boundary digests joined; only md5 digests
    // shuffle, text never does
    "d36_stitch_pairs" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(coalesce(text, ''), '\s+') AS tk
        |  FROM documents),
        |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 3),
        |sfx AS (SELECT doc_id AS a_id,
        |  md5(array_to_string(tk[-3:], ' ')) AS h FROM f),
        |pfx AS (SELECT doc_id AS b_id,
        |  md5(array_to_string(tk[1:3], ' ')) AS h FROM f)
        |SELECT a_id, b_id FROM sfx JOIN pfx USING (h)
        |WHERE a_id <> b_id ORDER BY a_id, b_id""".stripMargin,
    "e5_quantize" ->
      """WITH ex AS (SELECT vec_id,
        |    CAST(unnest(embedding) AS DOUBLE) AS x,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |sc AS (SELECT vec_id, MAX(ABS(x)) AS max_abs FROM ex GROUP BY vec_id),
        |q AS (SELECT e.vec_id, e.pos, s.max_abs,
        |    CASE WHEN s.max_abs = 0 THEN 0
        |      ELSE CAST(FLOOR(e.x * 127.0 / s.max_abs + 0.5) AS BIGINT)
        |    END AS q
        |  FROM ex e JOIN sc s USING (vec_id))
        |SELECT vec_id, MAX(max_abs) AS max_abs,
        |  CAST(SUM(ABS(q)) AS BIGINT) AS l1_q,
        |  CAST(SUM(q * pos) AS BIGINT) AS checksum,
        |  CAST(SUM(CASE WHEN ABS(q) = 127 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_saturated
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "d10_redact" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(key|hash|value)\b')) AS n_hits,
        |  md5(regexp_replace(text, '\b(key|hash|value)\b', '<MASKED>', 'g'))
        |    AS redacted_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d11_tfidf_top" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
        |             FROM documents),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
        |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, t,
        |    CAST(tf * (SELECT n_docs FROM n) // df AS BIGINT) AS score
        |  FROM tf JOIN df USING (t))
        |SELECT doc_id, t AS top_term, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, t DESC) AS rn FROM scored
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // replays d7's exact 3-gram Jaccard pairs over the full corpus,
    // then the transitive closure as a recursive CTE: component label =
    // min reachable doc_id (exactly dupClusters' min-label fixpoint)
    "p7_cluster_split" ->
      s"""$dupCompCte,
        |rp AS (SELECT d.doc_id, d.n_chars,
        |    COALESCE(c.comp, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |b AS (SELECT *,
        |    (strpos('0123456789abcdef', substr(md5(CAST(rep AS VARCHAR)), 1, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(md5(CAST(rep AS VARCHAR)), 2, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(md5(CAST(rep AS VARCHAR)), 3, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(md5(CAST(rep AS VARCHAR)), 4, 1)) - 1) AS bk
        |  FROM rp),
        |sp AS (SELECT doc_id, n_chars, rep,
        |    CASE WHEN bk < 52429 THEN 'train'
        |         WHEN bk < 58983 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b),
        |leak AS (SELECT CAST(COUNT(*) FILTER (ns > 1) AS BIGINT) AS leaked_clusters
        |  FROM (SELECT rep, COUNT(DISTINCT split) AS ns FROM sp GROUP BY rep))
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  (SELECT leaked_clusters FROM leak) AS leaked_clusters
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    "d9_dup_clusters" ->
      s"""$dupCompCte
        |SELECT comp AS cluster_rep, COUNT(*) AS n_members,
        |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
        |FROM comp GROUP BY comp ORDER BY cluster_rep""".stripMargin,
    "d24_dedup_survivors" ->
      s"""$dupCompCte,
        |removed AS (SELECT id FROM comp WHERE id <> comp)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc
        |FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM removed)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "d25_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, COUNT(*) AS cnt FROM tk
        |  WHERE len(tok) > 0 GROUP BY tok),
        |totals AS (SELECT COUNT(*) AS total_vocab,
        |  CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
        |ranked AS (SELECT cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk,
        |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM counts),
        |lv AS (SELECT * FROM (VALUES (50), (90), (99)) t(coverage_pct))
        |SELECT CAST(coverage_pct AS INT) AS coverage_pct,
        |  CAST(MIN(rk) AS BIGINT) AS vocab_size,
        |  MIN(total_vocab) AS total_vocab, MIN(total_tokens) AS total_tokens
        |FROM lv CROSS JOIN totals
        |JOIN ranked ON cum * 100 >= coverage_pct * total_tokens
        |GROUP BY coverage_pct ORDER BY coverage_pct""".stripMargin,
    "p2_rag_retrieval" ->
      """SELECT query_id, rank, vec_id, cosine, source, n_chars FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    d.source, d.n_chars,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |        CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id ASC) AS rank
        |  FROM embeddings q
        |  JOIN embeddings c ON c.vec_id <> q.vec_id
        |  JOIN documents d ON d.doc_id = c.vec_id
        |    AND d.lang = 'en' AND d.n_chars >= 200
        |  WHERE q.vec_id < 3
        |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "e1_knn_brute" ->
      """SELECT query_id, rank, vec_id, cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |        CAST(q.embedding AS DOUBLE[])), 6) DESC, c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |) WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "e12_range_search" ->
      """SELECT query_id, vec_id, cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cosine
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |) WHERE cosine >= 0.3 ORDER BY query_id, vec_id""".stripMargin,
    "d30_source_caps" ->
      """WITH ranked AS (SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rn <= 15 THEN doc_id END) AS BIGINT) AS kept_id_sum
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,
    "e4_emb_near_dup" -> embNearDupBandedSql,
    "e18_emb_dup_clusters" -> embDupClustersSql,
    "e19_emb_dup_sized" -> embDupSizedSql,
    "m4_media_dedup" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "m5_tiles" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 8) * 160 + 320 AS INT) AS width,
        |  CAST((doc_id % 8) * 90 + 180 AS INT) AS height,
        |  CAST(ceil(((doc_id % 8) * 160 + 320) / 224.0) AS BIGINT) AS tiles_x,
        |  CAST(ceil(((doc_id % 8) * 90 + 180) / 224.0) AS BIGINT) AS tiles_y,
        |  CAST(ceil(((doc_id % 8) * 160 + 320) / 224.0)
        |    * ceil(((doc_id % 8) * 90 + 180) / 224.0) AS BIGINT) AS n_tiles
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin,
    "m1_media_meta" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    CAST((doc_id % 8) * 160 + 320 AS INT) AS width,
        |    CAST((doc_id % 8) * 90 + 180 AS INT) AS height,
        |    CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END AS INT)
        |      AS sample_rate,
        |    text
        |  FROM documents
        |), b AS (
        |  -- rebuild the exact 12-byte GRFT header ‖ payload blob, then
        |  -- DECODE the reported fields from its bytes (hex-string
        |  -- slices = byte slices, 2 hex chars per byte)
        |  SELECT media_id, kind,
        |    hex(encode('GRFT')
        |      || unhex(lpad(to_hex(width), 4, '0'))
        |      || unhex(lpad(to_hex(height), 4, '0'))
        |      || unhex(lpad(to_hex(sample_rate), 8, '0'))
        |      || encode(text)) AS hx
        |  FROM m
        |)
        |SELECT media_id, kind,
        |  decode(unhex(substr(hx, 1, 8))) AS magic,
        |  CAST(concat('0x', substr(hx, 9, 4)) AS INT) AS width,
        |  CAST(concat('0x', substr(hx, 13, 4)) AS INT) AS height,
        |  CAST(concat('0x', substr(hx, 17, 8)) AS INT) AS sample_rate,
        |  CAST(length(hx) / 2 - 12 AS INT) AS n_bytes
        |FROM b ORDER BY media_id""".stripMargin,
    "m3_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST((octet_length(encode(text)) - 1) // 64 + 1 AS INT) AS n_frames
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY media_id""".stripMargin,
  )
}
