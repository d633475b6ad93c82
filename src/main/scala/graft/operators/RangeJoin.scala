package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (band) join — points matched to intervals with NO
  * equi-key. Spark plans a raw `p BETWEEN lo AND hi` join as a
  * BroadcastNestedLoopJoin (or a cartesian when neither side fits in a
  * broadcast): every point is tested against every interval, O(n·m)
  * work that cannot survive a 100 TB fact side. (The reference engine
  * has no join surface at all — its range scans are single-table; this
  * is north-star pipeline scope, the standard fix Spark itself lacks
  * as a native optimization.)
  *
  * The bucketing trick turns it into a plain equi-join: pick a bucket
  * width W, explode each interval to the `floor(lo/W)..floor(hi/W)`
  * buckets it overlaps, tag each point with its single bucket
  * `floor(p/W)`, hash-join on the bucket id, and keep the exact
  * `BETWEEN` as a residual filter. A (point, interval) match can only
  * arise in the point's one bucket, so the output needs no dedup.
  *
  * Scale shape: the fact (points) side never replicates — it shuffles
  * once on its bucket id like any equi-join probe. The interval side
  * grows by the interval-width/W expansion factor only; choosing W
  * near the typical interval width keeps that ≤ 2–3×. Skewed buckets
  * (many intervals stacked over one hot value range) are ordinary
  * equi-join skew — AQE's skew-join split applies, unlike a nested
  * loop. Whole plan: explode (map-only) + one hash join + residual
  * filter, all codegen.
  */
object RangeJoin {

  /** Inner-join `points` rows to every `intervals` row whose
    * [loCol, hiCol] (inclusive both ends) contains `pointCol`.
    * Emits all columns of both inputs; intervals with hi < lo are
    * empty by definition and drop out naturally (sequence guard).
    *
    * Callers should pre-project both inputs to the columns they need:
    * a band join's OUTPUT is often its dominant volume (every point ×
    * every covering interval), and every input column rides through
    * it — the round-9 10× step measured a 16.6× scale-up on the gate
    * query purely from carrying the fact side's JSON column, restored
    * to ~linear by projecting first (SCALE.md).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivb = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val ptb = points
      .withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    ptb.join(ivb, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
