package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north-star surface).
  *
  * Scale design: exact dedup is one hash-shuffle on the fingerprint;
  * MinHash/SimHash near-dup avoid the O(n²) pair space by LSH banding —
  * candidate pairs only form inside a (band, bucket) hash cell, so the
  * shuffle volume is O(n · bands) and the verify join touches only
  * candidates. The brute-force Jaccard pairer is intentionally bounded
  * (verification path / oracle) and documents its own limit.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on canonicalized text: winner = min doc_id per
    * fingerprint. One shuffle; at 100 TB this is the standard
    * hash-aggregate with map-side partial min.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(TextAnalysis.fingerprint(col("text")).as("fingerprint"),
        col("doc_id"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** word k-gram shingles (distinct), the MinHash input set. */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** deterministic 64-bit hash of a shingle under seed i. */
  private def seededHash(shingle: Column, seed: Int): Column =
    xxhash64(lit(seed), shingle)

  // -------------------------------------------------------- MinHash + LSH

  /** MinHash signatures: numHashes independent min-hashes per doc.
    * Computed per-row over the shingle array (no explode, no shuffle):
    * signature_i = min over shingles of xxhash64(seed_i, shingle).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 64): DataFrame = {
    val sh = shingles(col("text"), k)
    val sig = array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)
    docs.select(col("doc_id"), sig.as("signature"), sh.as("shingles"))
  }

  /** Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard
    * verification on candidates.
    *
    * bands × rowsPerBand = numHashes; a pair collides if any band's
    * signature slice matches exactly. Collision probability for true
    * Jaccard j is 1-(1-j^rows)^bands (the standard S-curve).
    */
  def minhashNearDup(docs: DataFrame, k: Int = 3, numHashes: Int = 64,
                     bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(docs, k, numHashes)

    // (band, bucket=hash(slice), doc) — one row per band per doc
    val bandStructs = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b) +: (0 until rows).map(r =>
          col("signature").getItem(b * rows + r)): _*).as("bucket"))
    }: _*)
    val buckets = sigs
      .select(col("doc_id"), col("shingles"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("shingles"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // candidate pairs: self-join within (band, bucket); a.id < b.id
    val a = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("a_id"), col("shingles").as("a_sh"))
    val b = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("b_id"), col("shingles").as("b_sh"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .dropDuplicates("a_id", "b_id")

    // verify: exact Jaccard over shingle sets (arrays already distinct)
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    cands
      .withColumn("jaccard", round(inter / uni, 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  // ------------------------------------------------- brute-force Jaccard

  /** Exact n-gram Jaccard over all pairs of a BOUNDED candidate set —
    * the verification/oracle path. O(n²): never run unbounded at scale;
    * the LSH path above is the scale path.
    */
  def jaccardPairs(docs: DataFrame, k: Int = 1, threshold: Double = 0.1,
                   maxDocId: Long = 50): DataFrame = {
    val base = docs.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), array_distinct(
        if (k == 1) TextAnalysis.tokens(col("text")) else shingles(col("text"), k)
      ).as("sh"))
    val a = base.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = base.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", round(inter / uni, 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: sign-sum of per-token hash bits.
    * Per-row expression tree (transform + aggregate over the token
    * array), no explode — one map-only pass at scale.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = array_distinct(TextAnalysis.tokens(col("text")))
    val hashes = transform(toks, t => xxhash64(t))
    // bit j of simhash = 1 if sum over tokens of (bit j set ? +1 : -1) > 0
    val bits: Seq[Column] = (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    docs.select(col("doc_id"),
      bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit chunks
    * (any-chunk-equal ⇒ candidate, guarantees recall for hamming ≤ 3),
    * verify by exact hamming distance.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val chunks = array((0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("key"))
    }: _*)
    val banded = sh.select(col("doc_id"), col("simhash"), explode(chunks).as("cb"))
      .select(col("doc_id"), col("simhash"),
        col("cb.chunk").as("chunk"), col("cb.key").as("key"))
    val a = banded.select(col("chunk"), col("key"),
      col("doc_id").as("a_id"), col("simhash").as("a_sim"))
    val b = banded.select(col("chunk"), col("key"),
      col("doc_id").as("b_id"), col("simhash").as("b_sim"))
    val ham = bit_count(col("a_sim").bitwiseXOR(col("b_sim")))
    a.join(b, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  // ------------------------------------------- embedding near-duplicates

  /** Embedding cosine near-dup pairs among a bounded candidate set
    * (oracle path); the scale path is Similarity.lshCandidates + this
    * verify step.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double, maxVecId: Long): DataFrame = {
    val base = emb.filter(col("vec_id") < maxVecId)
      .select(col("vec_id"), col("embedding"))
    val a = base.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = base.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cosine", round(Similarity.cosine(col("a_v"), col("b_v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** top-level: winners after exact + minhash near-dup removal
    * (keep the smallest doc_id of each near-dup cluster's pairs).
    */
  def dedupDocuments(docs: DataFrame, jaccardThreshold: Double = 0.5): DataFrame = {
    val losers = minhashNearDup(docs, threshold = jaccardThreshold)
      .select(col("b_id").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }
}
