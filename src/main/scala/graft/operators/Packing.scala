package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches (north-star surface; no
  * reference analog): concatenate the corpus in document order and cut
  * it into fixed-size token packs, reporting for every document which
  * pack it starts in, at what offset, and how many packs it spans —
  * the GPT-style concat-then-chunk layout (documents may straddle pack
  * boundaries; nothing is padded or dropped).
  *
  * The global token offset is a distributed two-level prefix sum, NOT
  * a single `Window.orderBy(id)` (which moves the whole corpus to one
  * partition — the WindowExec warning Spark itself emits):
  *   1. bucket documents by `id div bucketWidth`; an in-bucket running
  *      sum uses a window PARTITIONED by bucket (parallel, one shuffle);
  *   2. per-bucket totals (one row per bucket) get their own running
  *      sum — a single-partition window over ~corpus/bucketWidth rows,
  *      thousands at 100 TB, not billions — and broadcast-join back.
  * Offsets are exact BIGINT arithmetic end to end, so the layout is
  * bit-stable across engines and partitionings.
  */
object Packing {

  /** @param budget      tokens per pack (the training context length)
    * @param bucketWidth id-range width of a prefix-sum bucket; only
    *                    parallelism depends on it, never the result
    */
  def packSequences(docs: DataFrame, id: Column, nTokens: Column,
                    budget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "budget and bucketWidth must be > 0")
    val base = docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div $bucketWidth"))
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("local_end", sum(col("n_tokens")).over(inBucket))
    val acrossBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(acrossBuckets), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    local.join(broadcast(offsets), "bucket")
      .withColumn("start", col("bucket_offset") + col("local_end") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start div $budget").as("pack_first"),
        expr(s"start % $budget").as("pack_offset"),
        (expr(s"(start + n_tokens - 1) div $budget")
          - expr(s"start div $budget") + 1L).as("n_packs"))
  }

  /** Sliding-window chunking — the RAG / long-context layout dual of
    * [[packSequences]]: each document is cut independently into
    * overlapping windows of `window` tokens every `stride` tokens
    * (last chunk truncated, never padded). Purely per-document, so the
    * whole operator is map-side: one generator explode per row, no
    * shuffle, no cross-document coupling — at 100 TB it scales with
    * the scan. Output rows ≈ corpus_tokens / stride.
    */
  def slidingChunks(docs: DataFrame, id: Column, nTokens: Column,
                    window: Long, stride: Long): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      // sequence(0, n-1) needs n ≥ 1; a 0-token doc has no chunks
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(stride)))
          .as("chunk_start"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"chunk_start div $stride").as("chunk_id"),
        col("chunk_start"),
        least(lit(window), col("n_tokens") - col("chunk_start"))
          .as("chunk_len"))
  }
}
