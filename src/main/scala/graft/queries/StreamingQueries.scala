package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventsPipeline

/** Event-pipeline queries (SURVEY §2.5 streaming row / M6). The driver
  * gate runs these in batch mode; the identical transforms run under
  * Structured Streaming with watermarks in StreamingSpec (unified
  * batch/stream contract — see graft.streaming.EventsPipeline).
  */
object StreamingQueries {

  def s1Tumbling(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.tumblingCounts(Tables.events(s, dir))
      .orderBy(col("bucket"), col("event_type"))

  def s2Sliding(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.slidingCounts(Tables.events(s, dir))
      .orderBy(col("bucket"), col("event_type"))

  def s3Sessions(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.sessionize(Tables.events(s, dir))
      .orderBy(col("user_id"), col("session_start"))

  def s4DedupCounts(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.dedupedCounts(Tables.events(s, dir))
      .orderBy(col("event_type"))

  def s5UserTotals(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.userTotals(Tables.events(s, dir))
      .orderBy(col("user_id"))

  /** Stream-static enrichment: events joined to the customer dimension
    * (user_id = c_custkey), rolled up per market segment; events whose
    * user has no customer row land in the 'unknown' bucket — the
    * left-join contract a streaming enrichment must keep (dropping
    * unmatched events would silently lose data).
    */
  def s9Enriched(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    EventsPipeline.enrich(Tables.events(s, dir), dim, "user_id")
      .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.util.Exact.cents(col("value"))) / 100.0).as("value_total"))
      .orderBy(col("segment"), col("event_type"))
  }

  /** semi-structured event props: JSON string column parsed in-plan
    * (the schema-dynamic property bag of the reference's serialized
    * property cell, TikvFeatures.java:92-95 — here queryable directly).
    */
  def s6JsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("k_sum"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  /** as-of join: each error event → same user's latest prior click. */
  def s7AsofJoin(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.asOfJoin(Tables.events(s, dir), "error", "click")
      .orderBy(col("event_id"))

  /** interval join (10-minute lookback window). */
  def s8IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventsPipeline.intervalJoin(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "click"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** left-outer interval join: per user, errors WITH a click in the
    * 10-minute lookback vs errors with none (the unmatched rows a
    * streaming outer join releases on watermark passage).
    */
  def s11LeftInterval(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventsPipeline.intervalJoinLeft(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "click"))
      .groupBy(col("user_id"))
      .agg(countDistinct(when(col("click_id").isNotNull, col("err_id")))
          .as("n_matched"),
        countDistinct(when(col("click_id").isNull, col("err_id")))
          .as("n_unmatched"))
      .orderBy(col("user_id"))
  }

  /** Full-outer interval join: the two-sided audit the left join can't
    * express — per user, errors with a click in the lookback, errors
    * with none, AND clicks that precede no error (streaming releases
    * both orphan kinds on watermark passage).
    */
  def s17FullInterval(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    EventsPipeline.intervalJoinFull(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "click"))
      .groupBy(col("user_id"))
      .agg(countDistinct(when(col("click_id").isNotNull, col("err_id")))
          .as("n_matched"),
        countDistinct(when(col("click_id").isNull, col("err_id")))
          .as("n_orphan_errors"),
        countDistinct(when(col("err_id").isNull, col("click_id")))
          .as("n_orphan_clicks"))
      .orderBy(col("user_id"))
  }

  /** Gap sessionization (30-min inactivity, exact µs arithmetic) —
    * batch face of the flatMapGroupsWithState custom-state operator;
    * StreamingSpec pins that the stateful streaming path emits the
    * same closed sessions.
    */
  def s10GapSessions(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.gapSessions(Tables.events(s, dir))
      .orderBy(col("user_id"), col("session_start"))

  /** SCD-2 dimension build: per-user event_type version history with
    * half-open validity intervals (µs BIGINT end to end).
    */
  def s12Scd2(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.scd2(Tables.events(s, dir))
      .orderBy(col("user_id"), col("version"))

  /** Windowed top-1: the most frequent event type per 6-hour tumbling
    * bucket (count desc, type asc tie-break — total order). The
    * batch face of a per-window trending aggregation; the same
    * groupBy(window, type) shape runs under a watermark in streaming
    * (s1/s2 pin that machinery).
    */
  def s15WindowTop(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(s, dir)
      .groupBy(expr("CAST(floor(unix_micros(ts) / 21600000000) AS BIGINT)")
        .as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .orderBy(col("bucket"))
  }

  /** ordered signup→view→click→purchase funnel over the event log. */
  def s14Funnel(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.funnel(Tables.events(s, dir))
      .orderBy(col("step"))

  /** per-(user, type) counts — batch face of the transformWithState
    * MapState counter (StreamingSpec pins stream ≡ batch).
    */
  def s13TypeCounts(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.typeCounts(Tables.events(s, dir))
      .orderBy(col("user_id"), col("event_type"))

  /** CDC latest-state view over the event log as a change stream:
    * key = user, ord = event_id, delete-op = 'error' events. Batch
    * face of [[graft.streaming.EventsPipeline.cdcStateful]]
    * (StreamingSpec pins stream ≡ batch through MemoryStream).
    */
  def s16CdcState(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.cdcLatestState(Tables.events(s, dir))
      .orderBy(col("user_id"))

  /** chained windowed aggregation (5-min buckets → hourly roll-up);
    * the streaming face runs both levels incrementally under one
    * watermark (StreamingSpec pins stream ≡ batch).
    */
  def s18HourlyRollup(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.hourlyRollup(Tables.events(s, dir))
      .orderBy(col("hour_bucket"), col("event_type"))

  /** Late-data accounting under deterministic straggler injection:
    * every 97th event is DELIVERED 997 arrival positions late (its
    * event-time ts unchanged), each event_type is an independent
    * source tracking its own running-max watermark (10-minute
    * allowed lateness), and the gate reports per source how many
    * events a watermarked aggregate would have dropped plus their id
    * checksum — the numDroppedRows observability a real pipeline
    * needs broken down per source.
    */
  def s19LateData(s: SparkSession, dir: String): DataFrame =
    EventsPipeline.lateAccounting(
        Tables.events(s, dir), "event_type",
        col("event_id") + when(col("event_id") % 97 === 0, lit(997L))
          .otherwise(lit(0L)))
      .orderBy(col("event_type"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s19_late_data" -> (s19LateData _),
    "s18_hourly_rollup" -> (s18HourlyRollup _),
    "s16_cdc_state" -> (s16CdcState _),
    "s10_gap_sessions" -> (s10GapSessions _),
    "s12_scd2" -> (s12Scd2 _),
    "s13_type_counts" -> (s13TypeCounts _),
    "s14_funnel" -> (s14Funnel _),
    "s15_window_top" -> (s15WindowTop _),
    "s1_tumbling" -> (s1Tumbling _),
    "s2_sliding" -> (s2Sliding _),
    "s3_sessions" -> (s3Sessions _),
    "s4_dedup_counts" -> (s4DedupCounts _),
    "s5_user_totals" -> (s5UserTotals _),
    "s6_json_props" -> (s6JsonProps _),
    "s7_asof_join" -> (s7AsofJoin _),
    "s8_interval_join" -> (s8IntervalJoin _),
    "s11_left_interval" -> (s11LeftInterval _),
    "s17_full_interval" -> (s17FullInterval _),
    "s9_enriched" -> (s9Enriched _),
  )

  private val bucketSql =
    "CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // same straggler transform + per-source running-max watermark
    // replay; ROWS window ordered by (arrival key, event_id) — the
    // tie-break matters because a straggler can land on a resident key
    "s19_late_data" ->
      """WITH b AS (SELECT event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    event_id + CASE WHEN event_id % 97 = 0 THEN 997 ELSE 0 END AS ak
        |  FROM events),
        |f AS (SELECT event_type, event_id,
        |    CASE WHEN MAX(ts_us) OVER (PARTITION BY event_type
        |        ORDER BY ak, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        - 600000000 > ts_us
        |      THEN 1 ELSE 0 END AS late
        |  FROM b)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(late) AS BIGINT) AS n_late,
        |  CAST(COALESCE(SUM(CASE WHEN late = 1 THEN event_id END), 0)
        |    AS BIGINT) AS late_id_sum
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s18_hourly_rollup" ->
      s"""SELECT (b5 // 3600) * 3600 AS hour_bucket, event_type,
         |  CAST(SUM(n) AS BIGINT) AS n_events,
         |  COUNT(*) AS n_buckets, MAX(n) AS peak_bucket
         |FROM (SELECT $bucketSql AS b5, event_type, COUNT(*) AS n
         |      FROM events GROUP BY 1, 2)
         |GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin,
    "s16_cdc_state" ->
      """SELECT user_id, event_type AS last_type, value AS last_value
        |FROM (SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "s15_window_top" ->
      """WITH c AS (SELECT
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 21600000000) AS BIGINT)
        |      AS bucket,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, event_type, n FROM c
        |QUALIFY row_number() OVER (PARTITION BY bucket
        |  ORDER BY n DESC, event_type) = 1
        |ORDER BY bucket""".stripMargin,
    // greedy-earliest funnel replay: each CTE is the per-user first
    // qualifying time of its step after the previous step's time
    "s14_funnel" ->
      """WITH b AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f1 AS (SELECT user_id, MIN(us) AS t FROM b
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |f2 AS (SELECT b.user_id, MIN(b.us) AS t FROM b
        |  JOIN f1 USING (user_id)
        |  WHERE b.event_type = 'view' AND b.us > f1.t GROUP BY b.user_id),
        |f3 AS (SELECT b.user_id, MIN(b.us) AS t FROM b
        |  JOIN f2 USING (user_id)
        |  WHERE b.event_type = 'click' AND b.us > f2.t GROUP BY b.user_id),
        |f4 AS (SELECT b.user_id, MIN(b.us) AS t FROM b
        |  JOIN f3 USING (user_id)
        |  WHERE b.event_type = 'purchase' AND b.us > f3.t GROUP BY b.user_id)
        |SELECT 1 AS step, 'signup' AS event_type,
        |  (SELECT COUNT(*) FROM f1) AS n_users
        |UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM f2)
        |UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM f3)
        |UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM f4)
        |ORDER BY step""".stripMargin,
    "s13_type_counts" ->
      """SELECT user_id, event_type, COUNT(*) AS n FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    // SCD-2 replay: same (ts µs, event_id) ordering, run detection via
    // lag, run id via cumulative SUM (cast back from HUGEINT), version
    // intervals via lead over versions
    "s12_scd2" ->
      """WITH b AS (SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |r AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type
        |    THEN 1 ELSE 0 END AS chg
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS version FROM r),
        |g AS (SELECT user_id, version, event_type,
        |    MIN(ts_us) AS valid_from, COUNT(*) AS n_events
        |  FROM v GROUP BY 1, 2, 3)
        |SELECT user_id, version, event_type, valid_from,
        |  lead(valid_from) OVER wv AS valid_to,
        |  lead(valid_from) OVER wv IS NULL AS is_current,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM g WINDOW wv AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin,
    // ts is TIMESTAMP_NS in DuckDB's parquet read: CAST to TIMESTAMP
    // first so epoch_us matches Spark's µs truncation; the island id
    // is RANGE-framed for tie robustness (see EventsPipeline)
    "s10_gap_sessions" ->
      """WITH b AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CAST(ROUND((value)*100) AS BIGINT) AS cents FROM events),
        |f AS (SELECT user_id, ts_us, cents,
        |    CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |           IS NULL
        |         OR ts_us - LAG(ts_us) OVER (PARTITION BY user_id
        |           ORDER BY ts_us) > 1800000000
        |      THEN 1 ELSE 0 END AS ns
        |  FROM b),
        |s AS (SELECT user_id, ts_us, cents,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, MIN(ts_us) AS session_start,
        |  MAX(ts_us) AS session_end, COUNT(*) AS n_events,
        |  CAST(SUM(cents) AS BIGINT)/100.0 AS value_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "s1_tumbling" ->
      s"""SELECT $bucketSql AS bucket, event_type, COUNT(*) AS n,
         |  SUM(CAST(ROUND((value)*100) AS BIGINT))/100.0 AS value_sum
         |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "s2_sliding" ->
      s"""SELECT bucket, event_type, COUNT(*) AS n FROM (
         |  SELECT $bucketSql AS bucket, event_type FROM events
         |  UNION ALL
         |  SELECT $bucketSql - 300 AS bucket, event_type FROM events
         |) GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "s3_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                >= INTERVAL '30 minutes'
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "s4_dedup_counts" ->
      s"""SELECT event_type, COUNT(*) AS n FROM (
         |  SELECT DISTINCT user_id, event_type, $bucketSql FROM events
         |) GROUP BY 1 ORDER BY event_type""".stripMargin,
    "s9_enriched" ->
      """SELECT COALESCE(c_mktsegment, 'unknown') AS segment, event_type,
        |  COUNT(*) AS n,
        |  SUM(CAST(ROUND((value)*100) AS BIGINT))/100.0 AS value_total
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s5_user_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  SUM(CAST(ROUND((value)*100) AS BIGINT))/100.0 AS value_total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s6_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // CAST(ts AS TIMESTAMP) truncates DuckDB's ns to µs, matching the
    // engine's ns→µs conversion — without it, boundary comparisons and
    // window order ties can differ at sub-µs precision.
    "s7_asof_join" ->
      """SELECT event_id, user_id, asof_ref_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_ref_id
        |  FROM events WHERE event_type IN ('error', 'click')
        |) WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "s17_full_interval" ->
      """SELECT COALESCE(e.user_id, c.user_id) AS user_id,
        |  COUNT(DISTINCT CASE WHEN c.event_id IS NOT NULL
        |    THEN e.event_id END) AS n_matched,
        |  COUNT(DISTINCT CASE WHEN c.event_id IS NULL
        |    THEN e.event_id END) AS n_orphan_errors,
        |  COUNT(DISTINCT CASE WHEN e.event_id IS NULL
        |    THEN c.event_id END) AS n_orphan_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = e.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
        |   - INTERVAL '600 seconds'
        |GROUP BY COALESCE(e.user_id, c.user_id)
        |ORDER BY user_id""".stripMargin,
    "s11_left_interval" ->
      """SELECT e.user_id,
        |  COUNT(DISTINCT CASE WHEN c.event_id IS NOT NULL
        |    THEN e.event_id END) AS n_matched,
        |  COUNT(DISTINCT CASE WHEN c.event_id IS NULL
        |    THEN e.event_id END) AS n_unmatched
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = e.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
        |   - INTERVAL '600 seconds'
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "s8_interval_join" ->
      """SELECT e.user_id, COUNT(*) AS n_pairs
        |FROM events e JOIN events c
        |  ON c.user_id = e.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL '600 seconds'
        |WHERE e.event_type = 'error' AND c.event_type = 'click'
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
  )
}
