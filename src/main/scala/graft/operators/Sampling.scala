package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training-data pipelines
  * (north-star surface; no reference analog — the store's only
  * sampling is shard-scan R7).
  *
  * Buckets come from a cryptographic-hash prefix of the key
  * (md5 → first 16 bits), NOT from rand(): the split is stable across
  * runs, engines, partitionings, and insertion order, so a document's
  * train/val/test membership never flips — the property a training
  * pipeline actually needs. Everything is per-row codegen'd
  * expressions; a split/sample adds zero shuffles to whatever plan it
  * feeds.
  */
object Sampling {

  val Buckets = 65536 // md5 prefix width: 4 hex chars

  /** Stable bucket in [0, 65536) from the key's md5 prefix. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Assign a named split per row from weighted fractions
    * (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).
    * Weights must sum to 1; rounding dust goes to the last split.
    */
  def assignSplit(df: DataFrame, key: Column,
                  weights: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Buckets)
    }.tail.dropRight(1) :+ Buckets.toLong
    val b = hashBucket(key)
    val expr = weights.map(_._1).zip(bounds).foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** NEAR-DUP-AWARE split: assign train/val/test by the near-duplicate
    * CLUSTER representative, not the document id — the leakage guard a
    * training pipeline actually needs (a near-copy of a training
    * document landing in the eval split inflates every benchmark it
    * touches). `pairs` is a near-dup pair list (the LSH-banded source
    * at scale); [[Dedup.dupClusters]] closes it transitively, each doc
    * takes its cluster's min-id representative (itself when unpaired),
    * and [[assignSplit]] buckets the REP — so an entire cluster lands
    * in exactly one split by construction. Adds one left join against
    * the (pair-touched-ids-only, narrow) cluster table on top of the
    * plain split; output keeps the `rep` column so callers can audit
    * zero-leakage relationally.
    *
    * The cluster frame's columns are aliased to reserved names before
    * the join, so a docs frame that happens to carry its own `id` or
    * `comp` column is neither dropped nor made ambiguous; only `rep`
    * is claimed in the output (refused loudly if present — silently
    * overwriting the caller's column would corrupt their audit trail).
    */
  def clusterSplit(docs: DataFrame, pairs: DataFrame,
                   weights: Seq[(String, Double)],
                   idCol: String = "doc_id"): DataFrame = {
    require(!docs.columns.contains("rep"),
      "clusterSplit writes a 'rep' column; rename the existing one first")
    val comps = Dedup.dupClusters(pairs) // (id, comp), pair-touched only
      .select(col("id").as("__cs_id"), col("comp").as("__cs_comp"))
    val withRep = docs
      .join(comps, docs(idCol) === col("__cs_id"), "left")
      .withColumn("rep", coalesce(col("__cs_comp"), col(idCol)))
      .drop("__cs_id", "__cs_comp")
    assignSplit(withRep, col("rep"), weights)
  }

  /** Keep a stable `fraction` of rows by key — deterministic sampling
    * (same rows every run), unlike df.sample's seed-and-partition-
    * dependent draw.
    */
  def sampleFraction(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < math.round(fraction * Buckets))

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * drawn deterministically: rank rows inside each stratum by the
    * md5 of their key (key itself as tiebreak) and keep the first n.
    * The hash order is a stable pseudo-shuffle — unbiased w.r.t. any
    * natural ordering of the data, yet reproducible across runs and
    * engines. One window partitioned BY STRATUM (parallel across
    * strata; a skewed giant stratum sorts only its own partition) —
    * never a global sort.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       n: Int): DataFrame = {
    require(n > 0, "sample size must be > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Per-group cap: keep each group's n smallest-`key` rows (the
    * per-domain document cap every web-scale curation pipeline runs —
    * one mega-domain must not dominate the training mix). Unlike
    * [[stratifiedSample]]'s window (which shuffles EVERY row to its
    * group before ranking), this rides the bounded
    * [[graft.functions.TopKAggregator]]: map-side buffers hold at most
    * n entries per (group × partition), so the shuffle carries ≤
    * n·partitions rows per group no matter how skewed the domain —
    * the partial-aggregation win applied to capping. Returns
    * (groupCol, cap_rank, key) with cap_rank 1-based in ascending key
    * order.
    */
  def capPerGroup(df: DataFrame, group: String, key: String,
                  n: Int): DataFrame = {
    require(n > 0, "cap must be > 0")
    // constant score ⇒ the aggregator's id-ascending tie-break IS the
    // ordering: smallest n keys survive
    graft.functions.TopKAggregator.topKPerGroup(
        df.select(col(group), lit(0.0).as("cap_score"), col(key)),
        Seq(group), "cap_score", key, n)
      .select(col(group), col("rank").as("cap_rank"), col(key))
  }
}
