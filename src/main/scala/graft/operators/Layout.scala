package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan pruning. The
  * reference gets locality from its ordered KV keyspace (one sort
  * dimension per table); a columnar lake gets it from how rows are
  * laid out across files, because parquet min/max stats prune only
  * when values cluster. Z-ordering interleaves the bits of two sort
  * dimensions so rows close in EITHER dimension land close on the
  * curve — multi-dimensional clustering with a single sort key (the
  * Delta/Iceberg OPTIMIZE ZORDER technique, reconstructed on plain
  * Spark).
  *
  * Scale shape: the z-value is pure per-row integer arithmetic
  * (whole-stage codegen; disjoint bit positions mean the interleave is
  * a SUM of shifted bits — no UDF, engine-portable); the layout step
  * is one range repartition + in-partition sort, exactly the shuffle a
  * plain single-column sort would cost. Query-side benefit needs no
  * new operator: a predicate on either dimension prunes row groups via
  * ordinary parquet stats.
  */
object Layout {

  /** Morton (z-curve) value: interleave the low `bits` bits of two
    * non-negative columns — x_i at position 2i+1, y_i at 2i. Inputs
    * are masked to `bits` bits first. bits ≤ 31 keeps the result in a
    * positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftright(xm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(ym, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Rewrite `df` into `numPartitions` z-clustered partitions: range
    * partition + sort within partitions on the interleaved key, so
    * every output file covers a tight z-range (→ tight x AND y ranges
    * → row-group stats prune on either column). Keeps a `__z` column
    * for inspection; drop it before writing if undesired.
    */
  def zOrder(df: DataFrame, xCol: String, yCol: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
  }
}
