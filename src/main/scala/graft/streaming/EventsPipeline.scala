package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** input record of the custom-state sessionizer: event-time timestamp
  * (carries the stream's watermark) + integer cents (exact value sum).
  * Top-level so Spark's bean/product encoders can instantiate it.
  */
case class GapEvent(user_id: Long, ts: java.sql.Timestamp, cents: Long)

/** the one fixed-size state record per active user */
case class GapSessionState(start: Long, end: Long, n: Long, cents: Long)

/** a closed session: [start, end] in event-time µs, exact value sum */
case class GapSession(user_id: Long, session_start: Long, session_end: Long,
                      n_events: Long, value_sum: Double)

/** input / output records of the transformWithState per-user type
  * counter (top-level for product encoders).
  */
case class TypedEvent(user_id: Long, event_type: String)
case class TypeCount(user_id: Long, event_type: String, n: Long)

case class CdcChange(user_id: Long, ord: Long, event_type: String,
                     value: Double)
case class CdcState(ord: Long, tpe: String, value: Double)
// ord rides along so a consumer can pick each key's newest emission
// without relying on sink row order (Update mode re-emits per batch)
case class CdcRow(user_id: Long, ord: Long, last_type: String,
                  last_value: Double, deleted: Boolean)

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

  /** CHAINED windowed aggregation: 5-minute tumbling counts rolled up
    * into 1-hour buckets (events → Σn, bucket count, peak bucket) —
    * the multi-resolution dashboard cascade. In streaming this is the
    * chained-time-window pattern (Spark ≥ 3.4): the second groupBy
    * windows over `window_time` of the first agg's window column, so
    * BOTH stages run incrementally under one watermark — the naive
    * alternative (re-aggregating raw events per resolution) scans the
    * stream once per resolution and keeps per-event state twice.
    * Batch face identical; the oracle replays both levels.
    */
  def hourlyRollup(df: DataFrame, width: String = "5 minutes",
                   roll: String = "1 hour"): DataFrame =
    withWatermarked(df)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), roll).as("hw"),
        col("event_type"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_buckets"),
        max(col("n")).as("peak_bucket"))
      .select(unix_timestamp(col("hw.start")).as("hour_bucket"),
        col("event_type"), col("n_events"), col("n_buckets"),
        col("peak_bucket"))

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

  // ------------------------------------- transformWithState counters

  /** Per-(user, event_type) running counts on the arbitrary-state v2
    * API (`transformWithState`, Spark 4): one MapState[event_type →
    * count] per user instead of one opaque blob — the state store
    * reads/writes only the TOUCHED map entries of a micro-batch,
    * where a GroupState blob rewrites every user's whole state on any
    * update. Requires the RocksDB state store provider (composite-key
    * column families). Emits the updated (user, type, n) rows per
    * batch (Update mode). [[typeCounts]] is the batch face.
    *
    * Scale: state per user grows with its DISTINCT type set only;
    * RocksDB keeps the map off-heap and changelog-checkpoints
    * incrementally — this is the shape that holds at 10⁹ users.
    */
  class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TypedEvent, TypeCount] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    @transient private var counts:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("typeCounts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[TypedEvent],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      // fold the batch locally, ONE store write per touched type
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { e =>
        val base = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L)
        touched.update(e.event_type, base + 1L)
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.iterator.map { case (t, n) => TypeCount(user, t, n) }
    }
  }

  /** streaming face: requires RocksDBStateStoreProvider (see
    * StreamingSpec for the config line).
    */
  def typeCountsStateful(ds: Dataset[TypedEvent])
                        (implicit encK: Encoder[Long],
                         encOut: Encoder[TypeCount]): Dataset[TypeCount] =
    ds.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())

  /** batch face of [[typeCountsStateful]]: the final counts. */
  def typeCounts(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  // --------------------------------- streaming CDC latest-state view

  /** Streaming CDC materialized view — the continuous face of
    * `Writer.applyCdc`: per key, the change with the highest `ord`
    * wins and defines the key's current row; a delete-op change
    * (`event_type == "error"` in the events framing) tombstones it.
    * GroupState holds ONE (ord, type, value) triple per key, so state
    * size is O(live keys) and independent of change volume — the
    * Debezium-consumer shape that holds at 10⁹ keys. Late/out-of-order
    * changes are handled by the ord comparison, not arrival order:
    * an older change arriving after a newer one cannot regress state.
    *
    * Emits the key's current view (or a tombstone marker) each batch
    * it changes — Update mode, downstream upserts into the serving
    * store. [[cdcLatestState]] is the batch face over the same log.
    */
  def cdcStateful(ds: Dataset[CdcChange])
                 (implicit encK: Encoder[Long],
                  encS: Encoder[CdcState],
                  encOut: Encoder[CdcRow]): Dataset[CdcRow] =
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[CdcChange], state: GroupState[CdcState]) =>
          // fold THIS batch's changes to the max-ord winner, then
          // compare against the stored state — one read, one write.
          // Ties on ord break on (event_type, value) DESC — the same
          // total order cdcLatestState's window and Writer.applyCdc
          // use — so a tied-ord change cannot win by arrival order and
          // the stream and batch faces agree row-for-row on tied logs.
          def beats(aT: String, aV: Double, bT: String, bV: Double): Boolean =
            aT > bT || (aT == bT && aV > bV)
          val best = rows.reduce { (a, b) =>
            if (a.ord > b.ord || (a.ord == b.ord &&
              beats(a.event_type, a.value, b.event_type, b.value))) a else b
          }
          val cur = state.getOption
          if (cur.isEmpty || best.ord > cur.get.ord ||
              (best.ord == cur.get.ord &&
                beats(best.event_type, best.value, cur.get.tpe, cur.get.value))) {
            state.update(CdcState(best.ord, best.event_type, best.value))
            CdcRow(user, best.ord, best.event_type, best.value,
              deleted = best.event_type == "error")
          } else {
            val c = cur.get
            CdcRow(user, c.ord, c.tpe, c.value, deleted = c.tpe == "error")
          }
      }

  /** batch face of [[cdcStateful]]: collapse the whole change log to
    * the per-key winner, drop tombstoned keys. Ties on the ord column
    * (event_id) break on the remaining change columns DESC — the same
    * total order the stateful face and Writer.applyCdc use, so all
    * three CDC faces pick the same winner on tied-ord logs.
    */
  def cdcLatestState(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id").desc, col("event_type").desc, col("value").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
  }

  // ------------------------------------------------------ funnel

  /** Ordered funnel: how many users performed `steps` IN ORDER (each
    * step strictly after the previous one's first qualifying time,
    * the standard product-analytics funnel). Step i's frame is the
    * per-user earliest time of step i that follows the user's step
    * i−1 time — a greedy match, which is sufficient: if any
    * subsequence matches, greedy-earliest matches too.
    *
    * Scale: per step ONE narrow (user_id, t) join + min-agg — user
    * state never exceeds one timestamp per step, no event history
    * accumulates, no window over the whole stream. Step counts are
    * plan-level unions of 1-row aggregates (no driver collect).
    */
  def funnel(df: DataFrame,
      steps: Seq[String] = Seq("signup", "view", "click", "purchase"))
      : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = df.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    var prev: DataFrame = null
    val stages = steps.zipWithIndex.map { case (st, i) =>
      val cur =
        if (i == 0)
          base.filter(col("event_type") === st)
            .groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
        else
          base.filter(col("event_type") === st)
            .join(prev.select(col("user_id"), col("t").as("t_prev")),
              "user_id")
            .filter(col("ts_us") > col("t_prev"))
            .groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
      prev = cur
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }
    stages.reduce(_ union _)
  }

  // ------------------------------------------------- SCD-2 dimension

  /** Slowly-changing-dimension type-2 build from a change-event log:
    * per `key`, consecutive runs of one `attr` value collapse into a
    * half-open [valid_from, valid_to) version row; the latest version
    * has valid_to NULL / is_current true. The classic CDC → dimension
    * materialization (Kimball SCD2); hooked to foreachBatch +
    * Writer.upsert it maintains the dimension incrementally.
    *
    * Determinism: ordering is (event time µs, event_id) — the unique
    * id breaks timestamp ties identically on any engine. A value that
    * changes A→B→A yields three versions (runs, not distinct values).
    *
    * Scale: both windows and the run-collapse aggregate partition on
    * `key` alone, so the whole operator is ONE exchange on the
    * dimension key followed by sorted-within-partition passes; state
    * per key is its version list, never the event history.
    */
  def scd2(df: DataFrame, key: String = "user_id",
      attr: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col("ts_us"), col("event_id"))
    val wv = Window.partitionBy(col(key)).orderBy(col("version"))
    val prev = lag(col(attr), 1).over(w)
    df.select(col(key), col(attr),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col(attr), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("version"), col(attr))
      .agg(min(col("ts_us")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col("version"), col(attr), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events"))
  }

  // -------------------------------------------- custom-state sessions

  /** Gap sessionization, batch formulation (gaps-and-islands): a new
    * session starts when a user's inter-event gap exceeds `gapUs`
    * microseconds. Exact integer µs end to end (unix_micros, never
    * second-truncated), integer-cents value sums.
    *
    * Tie robustness: the island id is a RANGE-framed cumulative sum,
    * so events sharing one timestamp always land in one session no
    * matter how either engine orders the tie internally (a ROWS frame
    * would split a tied pair nondeterministically when the session
    * flag sits inside the tie group).
    *
    * Scale: one shuffle on user_id; both windows and the final
    * aggregate share that partitioning, so the whole operator is a
    * single exchange + sorted within partitions.
    */
  def gapSessions(df: DataFrame, gapUs: Long = 1800L * 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val base = df.select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      graft.util.Exact.cents(col("value")).as("cents"))
    base
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts_us") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("session_start"),
        max(col("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(col("cents")) / 100.0).as("value_sum"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("value_sum"))
  }

  /** Gap sessionization, streaming custom-state formulation:
    * `flatMapGroupsWithState` with event-time timeout — the
    * KeyValueGroupedDataset custom-state surface of SURVEY §2.5. Open
    * sessions live in the state store keyed by user; a session closes
    * (and emits, Append mode) when a later event of the same user
    * exceeds the gap, or when the event-time watermark passes
    * session_end + gap (state timeout — no later event needed).
    * Closed sessions match [[gapSessions]] row for row; the input
    * must carry a watermark (see withWatermarked).
    *
    * Scale: state is one small fixed-size record per ACTIVE user, not
    * per event; timeouts bound state lifetime to the gap, so the
    * store never grows with history.
    */
  def gapSessionsStateful(ds: Dataset[GapEvent], gapUs: Long = 1800L * 1000000)
                         (implicit encK: Encoder[Long],
                          enc1: Encoder[GapSessionState],
                          enc2: Encoder[GapSession]): Dataset[GapSession] = {
    val gapMs = gapUs / 1000
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapSessionState, GapSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[GapEvent],
         state: GroupState[GapSessionState]) =>
          def close(st: GapSessionState): GapSession =
            GapSession(user, st.start, st.end, st.n, st.cents / 100.0)
          def tsUs(e: GapEvent): Long =
            e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
          if (state.hasTimedOut) {
            val out = close(state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val closed = Seq.newBuilder[GapSession]
            var cur = state.getOption.orNull
            // iterator order within a micro-batch is not time order
            events.toSeq.sortBy(e => (tsUs(e), e.cents)).foreach { e =>
              val us = tsUs(e)
              cur match {
                case null =>
                  cur = GapSessionState(us, us, 1L, e.cents)
                case st if us - st.end <= gapUs =>
                  cur = GapSessionState(st.start, math.max(st.end, us),
                    st.n + 1, st.cents + e.cents)
                case st =>
                  closed += close(st)
                  cur = GapSessionState(us, us, 1L, e.cents)
              }
            }
            state.update(cur)
            // fire once the watermark passes end + gap (clamped above
            // the current watermark — setting a timeout at or before
            // it is rejected by the state store)
            state.setTimeoutTimestamp(
              math.max(cur.end / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
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

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]] but
    * an error with no preceding click still emits (null click_id) —
    * in streaming, the unmatched row is held in state and released
    * only once the watermark proves no matching click can arrive,
    * the outer-join state semantics Structured Streaming added for
    * exactly this shape. Both sides need watermarks; state on each
    * side is bounded by watermark + windowSec.
    */
  def intervalJoinLeft(errors: DataFrame, clicks: DataFrame,
                       windowSec: Int = 600): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"), col("user_id"),
      col("ts").as("err_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    e.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("err_ts") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $windowSec SECONDS"),
      "left_outer")
      .select(col("err_id"), col("user_id"), col("click_id"))
  }

  /** FULL OUTER stream-stream interval join: unmatched rows on BOTH
    * sides are held in state and released once the watermark proves no
    * partner can arrive — an error with no click in its lookback emits
    * (err_id, null) and a click that precedes no error emits
    * (null, click_id). Structured Streaming supports this since 3.1
    * for exactly this audit shape (which clicks led nowhere, which
    * errors had no cause); state per side stays bounded by
    * watermark + windowSec, same as the left-outer variant.
    */
  def intervalJoinFull(errors: DataFrame, clicks: DataFrame,
                       windowSec: Int = 600): DataFrame = {
    val e = errors.select(col("event_id").as("err_id"), col("user_id"),
      col("ts").as("err_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user_id"), col("ts").as("click_ts"))
    e.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("err_ts") &&
        col("click_ts") >= col("err_ts") - expr(s"INTERVAL $windowSec SECONDS"),
      "full_outer")
      .select(col("err_id"),
        coalesce(col("user_id"), col("c_user_id")).as("user_id"),
        col("click_id"))
  }

  /** Late-event accounting under a replayed per-source watermark: how
    * many events WOULD a watermarked streaming aggregate have dropped,
    * and which ones — the observability counterpart of every watermark
    * operator above (Spark reports this only as an opaque
    * numDroppedRows metric; training pipelines need the per-source
    * breakdown to size their allowed-lateness).
    *
    * Arrival order is `arrivalKey` (the position a shuffling transport
    * delivered the event, distinct from its event-time `ts`); each
    * `sourceCol` partition tracks its own running max event-time — the
    * per-source maxima whose executor-min IS Spark's global watermark,
    * so per-source lateness lower-bounds what the global accounting
    * would drop, deterministically and without a total order. An event
    * is late when its ts falls more than `delayUs` behind its source's
    * prior maximum. One window per source partition (sources are few
    * and bounded — Kafka-partition cardinality, not row cardinality),
    * then a hash-agg; ties on arrivalKey are broken by event_id so the
    * replay is engine-independent.
    */
  def lateAccounting(df: DataFrame, sourceCol: String, arrivalKey: Column,
                     delayUs: Long = 600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(arrivalKey, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("src_wm", max(col("ts_us")).over(w) - delayUs)
      .withColumn("is_late",
        col("src_wm").isNotNull && col("ts_us") < col("src_wm"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("is_late"), lit(1L)).otherwise(lit(0L))).as("n_late"),
        coalesce(sum(when(col("is_late"), col("event_id"))), lit(0L))
          .as("late_id_sum"))
  }
}
