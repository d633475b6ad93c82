package graft.util

import org.apache.spark.sql.SparkSession

/** Scale-adaptive partition sizing for persisted loop caches
  * (guide §2: derive partitioning from input size, never from a
  * constant tuned for either local mode or the cluster).
  *
  * Iterative operators persist an adjacency/cache frame partitioned
  * on the per-round join key. Partitioning it into the session's
  * `spark.sql.shuffle.partitions` (= core count in the bench) makes
  * every per-round stage pay full task-scheduling fan-out even when
  * the cache is a few thousand rows. Measured same-JVM A/B
  * (AbLoopProbe `prn`, sf0.1): the 16k-row geo-gate cache at ONE
  * partition wins every alternated pair (6.04 → 5.79 min); the
  * 1.36M-row full-graph cache LOSES at 1 partition (13.55 → 16.06)
  * and still loses at 6 (12.33 → 14.51) — real per-round compute
  * wants the full fan-out there. So the sizing is deliberately
  * asymmetric: collapse only caches that genuinely don't fill the
  * session's partitioning (~32k rows per partition before opening
  * the next), and NEVER exceed the session's configured shuffle
  * partitioning — at cluster scale the cap follows the cluster
  * config exactly as the constant did, while tiny inputs stop
  * paying 32-way scheduling for single-task work.
  */
object Partitioning {
  def loopParts(s: SparkSession, rows: Long,
                rowsPerPart: Long = 32768L): Int = {
    val cap = math.max(1,
      s.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt)
        .getOrElse(s.sparkContext.defaultParallelism))
    math.max(1L, math.min(cap.toLong,
      (rows + rowsPerPart - 1) / rowsPerPart)).toInt
  }
}
