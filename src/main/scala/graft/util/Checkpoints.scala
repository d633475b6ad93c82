package graft.util

import org.apache.spark.sql.DataFrame

/** Rolling localCheckpoint for iterative loops — the round-(k−1)
  * block-release fix (SCALE.md "Known open scale items", round 10).
  *
  * `df.localCheckpoint()` materializes the state as cached RDD blocks
  * and truncates lineage, but the blocks live until Spark's
  * ContextCleaner notices the dead reference AT THE NEXT GC — so an
  * N-round loop transiently pins up to O(N × |state|) blocks. Benign
  * at sf0.1 (narrow state), but the transient footprint scales with
  * the state row count: at 100× it competes with the shuffle/cache
  * memory the loop actually needs. The fix is deterministic release:
  * once round k's checkpoint has materialized (localCheckpoint is
  * eager by default), round k−1's blocks can never be read again —
  * the new checkpoint IS the lineage root — so they are unpersisted
  * explicitly instead of waiting for a GC to find them.
  *
  * Safety: applies ONLY to strictly-rolling state (each round's frame
  * read exclusively by round k+1). Loops that keep per-round frames
  * for a later pass (e.g. Brandes' backward dependency sweep over all
  * BFS levels) must NOT roll them — those sites keep the plain
  * localCheckpoint.
  */
object Checkpoints {

  /** Free the cached blocks behind a localCheckpoint'ed frame.
    * No-op on frames that are not checkpoint-backed.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** One rolling checkpoint slot: `roll(df)` eagerly checkpoints `df`
    * and releases the slot's previous checkpoint. The LAST checkpoint
    * is never released here — it is the loop's result; callers that
    * materialize a derived result before returning may call
    * `releaseLast()` after doing so.
    *
    * `resetStats = true` additionally severs Catalyst's statistics
    * inheritance at the checkpoint boundary: `localCheckpoint` copies
    * the PRE-checkpoint plan's `sizeInBytes` estimate (an exact
    * BigInt) onto the resulting `LogicalRDD`, and a loop whose round
    * SELF-JOINS its own state (pointer jumping) then SQUARES that
    * estimate every round — the BigInt's digit count doubles per
    * roll, and after ~30 rolls the driver spins for hours inside
    * BigInteger.multiply during stats estimation of the NEXT
    * checkpoint (observed: Borůvka MSF, 6 rounds × 8 jumps ⇒
    * gigadigit ToomCook multiplies, main thread pinned). Rebuilding
    * the frame from the checkpointed RDD through the public
    * createDataFrame boundary drops the inherited estimate (fresh
    * default stats), at the cost of a narrow Row↔InternalRow map on
    * each downstream read — linear in the (small, ≤V-row) state.
    * Leave false for multiply-by-constant loops (PageRank et al.):
    * their digit growth is linear per round and the conversion would
    * be pure overhead.
    */
  final class Rolling(resetStats: Boolean = false) {
    private var prev: Option[DataFrame] = None
    def roll(df: DataFrame): DataFrame = {
      val chk = df.localCheckpoint() // eager: materialized before release
      prev.foreach(release)
      prev = Some(chk)
      if (resetStats) chk.sparkSession.createDataFrame(chk.rdd, chk.schema)
      else chk
    }
    /** adopt an existing checkpointed frame as the slot's current */
    def seed(chk: DataFrame): DataFrame = { prev = Some(chk); chk }
    def releaseLast(): Unit = { prev.foreach(release); prev = None }
  }
}
