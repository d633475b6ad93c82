package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming events pipeline (SURVEY §2.5 streaming row).
  *
  * The reference's only stream-ish features are per-entry TTL (W1,
  * TikvTable.java:95-101) and resumable paging (R1); real streaming
  * semantics — event-time windows, watermarks, dedup-within-watermark,
  * sessionization — are new surface, built on Structured Streaming.
  *
  * Every transform below is defined DataFrame→DataFrame so the SAME
  * code runs in batch mode (driver correctness gate, DuckDB oracle)
  * and streaming mode (readStream/MemoryStream — exercised in the
  * StreamingSpec with watermarks and late data). This is Spark's
  * unified-batch-stream contract, used deliberately.
  */
object EventsPipeline {

  /** add an event-time watermark when the frame is streaming; no-op
    * semantics change in batch.
    */
  def withWatermarked(df: DataFrame, delay: String = "10 minutes"): DataFrame =
    if (df.isStreaming) df.withWatermark("ts", delay) else df

  /** Tumbling 5-minute windows per event_type: count + exact value sum
    * (integer-cents — see graft.util.Exact).
    */
  def tumblingCounts(df: DataFrame, width: String = "5 minutes"): DataFrame =
    withWatermarked(df)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.util.Exact.cents(col("value"))) / 100.0).as("value_sum"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("value_sum"))

  /** Sliding windows (10-minute width, 5-minute hop) per event_type. */
  def slidingCounts(df: DataFrame, width: String = "10 minutes",
                    hop: String = "5 minutes"): DataFrame =
    withWatermarked(df)
      .groupBy(window(col("ts"), width, hop), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"))

  /** Session windows per user (30-minute inactivity gap): event count,
    * session start. The streaming-native analog of gaps-and-islands.
    */
  def sessionize(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    withWatermarked(df, "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Dedup within watermark: first event per (user_id, event_type,
    * 5-minute bucket). In streaming mode this is
    * dropDuplicatesWithinWatermark state; in batch, plain dropDuplicates
    * on the same keys.
    */
  def dedupedCounts(df: DataFrame): DataFrame = {
    val keyed = withWatermarked(df)
      .withColumn("bucket", unix_timestamp(window(col("ts"), "5 minutes")("start")))
    val deduped =
      if (df.isStreaming)
        keyed.dropDuplicatesWithinWatermark("user_id", "event_type", "bucket")
      else keyed.dropDuplicates("user_id", "event_type", "bucket")
    deduped.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
  }

  /** per-user running totals — in streaming this is the
    * mapGroupsWithState shape (see StreamingSpec); batch analog is a
    * plain aggregate, same output contract.
    */
  def userTotals(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.util.Exact.cents(col("value"))) / 100.0).as("value_total"))

  /** Stream-static enrichment: attach dimension attributes to each
    * event by key. The dimension side is broadcast — in streaming this
    * is the supported stream-static join (dimension re-read per
    * micro-batch, no state); in batch it's a plain broadcast hash
    * join. At 100 TB the events side never shuffles for this join.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** As-of join composed from built-ins (SURVEY §7.3 decision table
    * path (a): compose before customizing): for every event of
    * `needType`, attach the same user's most recent prior-or-equal
    * event of `refType`. One union + one window — no range-join
    * blowup; at scale this is a single shuffle on user_id with the
    * window running sorted within partitions.
    */
  def asOfJoin(df: DataFrame, needType: String, refType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tagged = df.filter(col("event_type").isin(needType, refType))
      .withColumn("ref_id",
        when(col("event_type") === refType, col("event_id")))
    tagged
      .withColumn("asof_ref_id", last(col("ref_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === needType)
      .select(col("event_id"), col("user_id"), col("asof_ref_id"))
  }

  /** Stream-stream interval join (exercised with watermarks in
    * StreamingSpec): error events joined to the same user's click
    * events within the preceding `windowSec` seconds.
    */
  def intervalJoin(errors: DataFrame, clicks: DataFrame, windowSec: Int = 600): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"), col("user_id"),
      col("ts").as("err_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    e.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("err_ts") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("err_id"), col("user_id"), col("click_id"))
  }
}
