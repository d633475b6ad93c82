package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.EventsPipeline

/** top-level so Spark encoders can instantiate it (inner classes need
  * an outer pointer the deserializer doesn't have).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Streaming-mode semantics (SURVEY §5.4): the SAME EventsPipeline
  * transforms that pass the batch oracle, driven through MemoryStream
  * with watermarks — window emission, late-data drop, dedup state,
  * session merge, and mapGroupsWithState running counts.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
                 v: Double = 1.0) =
    Ev(id, Timestamp.valueOf(t), user, typ, v)

  private def runStream[T](stream: MemoryStream[Ev],
                           plan: org.apache.spark.sql.DataFrame,
                           name: String, mode: OutputMode = OutputMode.Append)
                          (batches: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    val q = plan.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("lateAccounting: hand-computed per-source lateness replay") {
    // one source, arrival order = event_id; event 3 carries a 100 s
    // event-time against a source max of 2000 s ⇒ with 600 s allowed
    // lateness its ts < 2000−600 and it is LATE; event 4 at 1500 s is
    // within the allowance and survives
    val df = Seq(
      ev(1, "2024-01-01 00:16:40"), // 1000 s
      ev(2, "2024-01-01 00:33:20"), // 2000 s
      ev(3, "2024-01-01 00:01:40"), // 100 s  — late
      ev(4, "2024-01-01 00:25:00")  // 1500 s — inside allowance
    ).toDF()
    val got = EventsPipeline.lateAccounting(df, "event_type", col("event_id"),
        delayUs = 600000000L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 4L, 1L, 3L)))
    // two sources: each tracks its OWN watermark — the same late event
    // under a different source whose max is still low is NOT late
    val two = Seq(
      ev(1, "2024-01-01 00:33:20", typ = "click"),
      ev(2, "2024-01-01 00:01:40", typ = "view"), // its source max unset
      ev(3, "2024-01-01 00:01:40", typ = "click") // late vs click's max
    ).toDF()
    val g2 = EventsPipeline.lateAccounting(two, "event_type", col("event_id"),
        delayUs = 600000000L)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(g2 == Map("click" -> ((2L, 1L, 3L)), "view" -> ((1L, 0L, 0L))))
  }

  test("tumbling windows emit on watermark passage; late data dropped") {
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.tumblingCounts(stream.toDF()), "t_tumbling")(Seq(
      Seq(ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00")),
      // this event is 2 min late but within the 10-min watermark → counted
      Seq(ev(3, "2024-01-01 00:14:00"), ev(4, "2024-01-01 00:12:00")),
      // advance watermark beyond 00:05 so window [00:00,00:05) closes
      Seq(ev(5, "2024-01-01 00:30:00")),
      // 25 min late, beyond watermark → dropped silently
      Seq(ev(6, "2024-01-01 00:03:00")),
      Seq(ev(7, "2024-01-01 00:55:00")) // close remaining windows
    ))
    val rows = out.select("bucket", "n").as[(Long, Long)].collect().toMap
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(rows(base) == 2) // late event 6 NOT counted
    assert(rows(base + 600) == 2) // 00:10 window: events 3+4
    assert(rows(base + 1800) == 1)
  }

  test("chained windowed aggregation: 5-min buckets roll into hourly, incrementally") {
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.hourlyRollup(stream.toDF()), "t_rollup")(Seq(
      // hour 0: three 5-min buckets (00:01|00:02 share one; 00:12; 00:31)
      Seq(ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00"),
        ev(3, "2024-01-01 00:12:00"), ev(4, "2024-01-01 00:31:00")),
      // hour 1 + watermark past hour 0's close
      Seq(ev(5, "2024-01-01 01:20:00")),
      Seq(ev(6, "2024-01-01 03:00:00")) // close hour 1
    ))
    val rows = out.select("hour_bucket", "n_events", "n_buckets", "peak_bucket")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (b, n, k, p) => b -> (n, k, p) }.toMap
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(rows(base) == ((4L, 3L, 2L)), s"got $rows")
    assert(rows(base + 3600) == ((1L, 1L, 1L)))
    // stream output ≡ the batch face on the same rows (the unified
    // contract the s18 gate rides on)
    val batch = EventsPipeline.hourlyRollup(Seq(
        ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00"),
        ev(3, "2024-01-01 00:12:00"), ev(4, "2024-01-01 00:31:00"),
        ev(5, "2024-01-01 01:20:00"), ev(6, "2024-01-01 03:00:00")).toDF())
      .select("hour_bucket", "n_events", "n_buckets", "peak_bucket")
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = out.select("hour_bucket", "n_events", "n_buckets", "peak_bucket")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the stream never closes the final (03:00) hour — compare on the
    // closed windows it did emit
    assert(streamed.subsetOf(batch) && streamed.size == 2, s"got $streamed vs $batch")
  }

  test("dropDuplicatesWithinWatermark dedups per key bucket") {
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.dedupedCounts(stream.toDF()), "t_dedup",
      OutputMode.Update)(Seq(
      Seq(ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00"),
        ev(3, "2024-01-01 00:03:30", typ = "buy")),
      Seq(ev(9, "2024-01-01 01:00:00", typ = "other"))
    ))
    val rows = out.groupBy("event_type").agg(max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows("click") == 1) // events 1,2 share (user,type,bucket)
    assert(rows("buy") == 1)
  }

  test("session windows merge events within gap") {
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.sessionize(stream.toDF()), "t_sessions")(Seq(
      Seq(ev(1, "2024-01-01 00:00:00"), ev(2, "2024-01-01 00:10:00"),
        ev(3, "2024-01-01 01:00:00")), // gap > 30 min → second session
      Seq(ev(4, "2024-01-01 04:00:00")) // advance watermark, close sessions
    ))
    val rows = out.select("session_start", "n_events").as[(Long, Long)].collect().toMap
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(rows(base) == 2)
    assert(rows(base + 3600) == 1)
  }

  test("foreachBatch upsert sink: streaming writes with MERGE semantics") {
    val target = "target/test-output/upsert_sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(target))
    // seed state
    Seq((1L, "old-1"), (2L, "old-2")).toDF("user_id", "tag")
      .write.mode("overwrite").parquet(target)
    val stream = MemoryStream[Ev]
    val q = stream.toDF()
      .select(col("user_id"), concat(lit("new-"), col("event_id")).as("tag"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the reference's buffered mutation batch (W9) = one micro-batch;
        // upsert gives the MERGE semantics its commit applies
        val current = spark.read.parquet(target)
        val merged = graft.operators.Writer
          .upsert(current, batch.dropDuplicates("user_id"), Seq("user_id"))
        merged.write.mode("overwrite").parquet(target + ".tmp")
        val fresh = spark.read.parquet(target + ".tmp")
        fresh.write.mode("overwrite").parquet(target)
        ()
      }
      .option("checkpointLocation", "target/test-output/upsert_ckpt_" +
        System.nanoTime())
      .start()
    try {
      stream.addData(Seq(ev(10, "2024-01-01 00:00:00", user = 2),
        ev(11, "2024-01-01 00:01:00", user = 3)))
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.parquet(target)
      .as[(Long, String)].collect().toMap
    assert(state(1L) == "old-1")    // untouched
    assert(state(2L) == "new-10")   // updated
    assert(state(3L) == "new-11")   // inserted
  }

  test("streaming CDC view: latest change wins, tombstones delete, " +
      "out-of-order changes cannot regress state — stream equals batch") {
    import graft.streaming.{CdcChange, CdcRow}
    val stream = MemoryStream[CdcChange]
    val q = EventsPipeline.cdcStateful(stream.toDS())
      .toDF().writeStream.format("memory").queryName("t_cdc")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 1 upserts twice (ord 2 wins), user 2 upserts
      stream.addData(Seq(CdcChange(1L, 1L, "view", 10.0),
        CdcChange(1L, 2L, "click", 20.0), CdcChange(2L, 1L, "view", 5.0)))
      q.processAllAvailable()
      // batch 2: user 1 gets an OLDER change (must not regress),
      // user 2 is tombstoned, user 3 appears
      stream.addData(Seq(CdcChange(1L, 1L, "view", 11.0),
        CdcChange(2L, 9L, "error", 0.0), CdcChange(3L, 1L, "purchase", 7.0)))
      q.processAllAvailable()
    } finally q.stop()
    // final view = per user, the emission carrying the max ord (the
    // row itself says which state version it reflects — no reliance
    // on sink row order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ord".desc)
    val finalView = spark.table("t_cdc")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).filter(!$"deleted")
      .select($"user_id", $"last_type", $"last_value")
      .as[(Long, String, Double)].collect().toSet
    assert(finalView == Set((1L, "click", 20.0), (3L, "purchase", 7.0)))
    // stream ≡ batch: same view from the batch face over the full log
    val log = Seq((1L, 1L, "view", 10.0), (1L, 2L, "click", 20.0),
      (2L, 1L, "view", 5.0), (1L, 1L, "view", 11.0),
      (2L, 9L, "error", 0.0), (3L, 1L, "purchase", 7.0))
      .toDF("user_id", "event_id", "event_type", "value")
    val batch = EventsPipeline.cdcLatestState(log)
      .as[(Long, String, Double)].collect().toSet
    assert(batch == finalView)
  }

  test("CDC tied ords: stream and batch faces pick the same data-determined winner") {
    import graft.streaming.CdcChange
    val stream = MemoryStream[CdcChange]
    val q = EventsPipeline.cdcStateful(stream.toDS())
      .toDF().writeStream.format("memory").queryName("t_cdc_tie")
      .outputMode(OutputMode.Update).start()
    try {
      // two tied-ord changes in ONE batch (the reduce path), then a
      // third tied change arriving LATER (the state-compare path): the
      // winner must be the (event_type, value) DESC maximum in every
      // case — arrival order must not matter
      stream.addData(Seq(CdcChange(1L, 5L, "click", 1.0),
        CdcChange(1L, 5L, "view", 9.0)))
      q.processAllAvailable()
      stream.addData(Seq(CdcChange(1L, 5L, "view", 3.0))) // loses: 3.0 < 9.0
      q.processAllAvailable()
    } finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ord".desc)
    val streamView = spark.table("t_cdc_tie")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1).select($"user_id", $"last_type", $"last_value")
      .as[(Long, String, Double)].collect().toSet
    assert(streamView == Set((1L, "view", 9.0)))
    val log = Seq((1L, 5L, "click", 1.0), (1L, 5L, "view", 9.0),
      (1L, 5L, "view", 3.0)).toDF("user_id", "event_id", "event_type", "value")
    val batch = EventsPipeline.cdcLatestState(log)
      .as[(Long, String, Double)].collect().toSet
    assert(batch == streamView)
  }

  test("transformWithState MapState counter: final counts match batch") {
    import graft.streaming.{TypedEvent, TypeCount}
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[TypedEvent]
      val q = EventsPipeline.typeCountsStateful(stream.toDS())
        .toDF().writeStream.format("memory").queryName("t_twstate")
        .outputMode(OutputMode.Update).start()
      try {
        stream.addData(Seq(TypedEvent(1L, "click"), TypedEvent(1L, "click"),
          TypedEvent(2L, "error")))
        q.processAllAvailable()
        stream.addData(Seq(TypedEvent(1L, "click"), TypedEvent(1L, "view"),
          TypedEvent(2L, "error")))
        q.processAllAvailable()
      } finally q.stop()
      // last update per (user, type) = the running count after batch 2
      val last = spark.table("t_twstate")
        .groupBy($"user_id", $"event_type")
        .agg(org.apache.spark.sql.functions.max($"n").as("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(last == Set((1L, "click", 3L), (1L, "view", 1L),
        (2L, "error", 2L)))
      // stream ≡ batch: same counts as the batch face over all events
      val batch = EventsPipeline.typeCounts(Seq(
        (1L, "click"), (1L, "click"), (2L, "error"),
        (1L, "click"), (1L, "view"), (2L, "error"))
        .toDF("user_id", "event_type"))
        .as[(Long, String, Long)].collect().toSet
      assert(batch == last)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provider, v)
        case None => spark.conf.unset(provider)
      }
    }
  }

  test("scd2 collapses runs into versions; A->B->A yields three") {
    val evs = Seq(
      ev(1, "2024-01-01 10:00:00", typ = "a"),
      ev(2, "2024-01-01 10:05:00", typ = "a"),
      ev(3, "2024-01-01 10:10:00", typ = "b"),
      ev(4, "2024-01-01 10:20:00", typ = "a"),
      ev(5, "2024-01-01 10:00:00", user = 2L, typ = "x"))
    val out = EventsPipeline.scd2(evs.toDF())
      .orderBy("user_id", "version")
      .select("user_id", "version", "event_type", "is_current", "n_events")
      .as[(Long, Long, String, Boolean, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, "a", false, 2L), (1L, 2L, "b", false, 1L),
      (1L, 3L, "a", true, 1L), (2L, 1L, "x", true, 1L)))
    // half-open intervals chain: version n's valid_to = n+1's valid_from
    val iv = EventsPipeline.scd2(evs.toDF()).filter($"user_id" === 1L)
      .orderBy("version").select("valid_from", "valid_to")
      .as[(Long, Option[Long])].collect()
    assert(iv(0)._2.contains(iv(1)._1) && iv(1)._2.contains(iv(2)._1)
      && iv(2)._2.isEmpty)
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    val stream = MemoryStream[Ev]
    val counts = stream.toDS().groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          (user, n)
      }
    val q = counts.toDF("user_id", "n").writeStream.format("memory")
      .queryName("t_state").outputMode(OutputMode.Update).start()
    try {
      stream.addData(Seq(ev(1, "2024-01-01 00:00:00", user = 7),
        ev(2, "2024-01-01 00:01:00", user = 7)))
      q.processAllAvailable()
      stream.addData(Seq(ev(3, "2024-01-01 00:02:00", user = 7)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("t_state").groupBy("user_id").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(last(7L) == 3L) // state carried across micro-batches
  }

  test("flatMapGroupsWithState gap sessions: closed sessions match the batch analog") {
    val gapUs = 600L * 1000000 // 10-minute gap for a compact fixture
    val evs1 = Seq(ev(1, "2024-01-01 00:00:00", user = 7, v = 1.25),
      ev(2, "2024-01-01 00:05:00", user = 7, v = 2.50),
      ev(3, "2024-01-01 00:00:00", user = 8, v = 0.75))
    val evs2 = Seq(ev(4, "2024-01-01 01:00:00", user = 7, v = 4.00), // > gap: closes 7's first session
      ev(5, "2024-01-01 00:08:00", user = 8, v = 1.00)) // extends 8's session
    // sentinels only advance the watermark past everyone's end + gap
    // so the open sessions close via event-time TIMEOUT, not data
    val evs3 = Seq(ev(6, "2024-01-01 03:00:00", user = 99))
    val evs4 = Seq(ev(7, "2024-01-01 03:30:00", user = 99))
    val stream = MemoryStream[Ev]
    val input = stream.toDF()
      .withWatermark("ts", "1 minute")
      .select(col("user_id"), col("ts"),
        graft.util.Exact.cents(col("value")).as("cents"))
      .as[graft.streaming.GapEvent]
    val out = EventsPipeline.gapSessionsStateful(input, gapUs).toDF()
    val got = runStream(stream, out, "t_gap")(Seq(evs1, evs2, evs3, evs4))
      .filter(col("user_id") =!= 99)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    val batch = EventsPipeline.gapSessions(
        (evs1 ++ evs2).toDF(), gapUs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    // user 7: [00:00,00:05] closed by the 01:00 event, [01:00] by
    // timeout; user 8: [00:00,00:08] by timeout — identical rows,
    // session bounds in µs, exact cents sums
    assert(batch.size == 3)
    assert(got == batch)
  }

  test("stream-stream interval join pairs clicks with subsequent errors") {
    val errors = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventsPipeline.intervalJoin(
      errors.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(ev(10, "2024-01-01 00:00:00", user = 1, typ = "click"),
        ev(11, "2024-01-01 00:20:00", user = 1, typ = "click")))
      errors.addData(Seq(ev(20, "2024-01-01 00:05:00", user = 1, typ = "error"),
        ev(21, "2024-01-01 00:40:00", user = 1, typ = "error")))
      q.processAllAvailable()
      // advance both watermarks to flush
      clicks.addData(Seq(ev(12, "2024-01-01 02:00:00", user = 9, typ = "click")))
      errors.addData(Seq(ev(22, "2024-01-01 02:00:00", user = 9, typ = "error")))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("t_ssjoin").select("err_id", "click_id")
      .as[(Long, Long)].collect().toSet
    // error 20 pairs with click 10 (5 min before); error 21 pairs with
    // neither (click 11 is 20 min before > 600s window)
    assert(pairs.contains((20L, 10L)))
    assert(!pairs.exists(_._1 == 21L))
  }

  test("left-outer interval join releases unmatched errors on watermark passage") {
    val errors = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventsPipeline.intervalJoinLeft(
      errors.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssleft")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(ev(10, "2024-01-01 00:00:00", user = 1, typ = "click")))
      errors.addData(Seq(ev(20, "2024-01-01 00:05:00", user = 1, typ = "error"),
        ev(21, "2024-01-01 00:40:00", user = 1, typ = "error"))) // no click in window
      q.processAllAvailable()
      // watermark must pass err_ts + lookback before the unmatched
      // error can be proven matchless and released with a null click
      clicks.addData(Seq(ev(12, "2024-01-01 03:00:00", user = 9, typ = "click")))
      errors.addData(Seq(ev(22, "2024-01-01 03:00:00", user = 9, typ = "error")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_ssleft")
      .select(col("err_id"), col("click_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows.contains((20L, 10L))) // matched pair
    assert(rows.contains((21L, -1L))) // unmatched, released as null
  }

  test("full-outer interval join releases BOTH orphan kinds on watermark") {
    val errors = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventsPipeline.intervalJoinFull(
      errors.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("t_ssfull")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(ev(10, "2024-01-01 00:00:00", user = 1, typ = "click"),
        ev(11, "2024-01-01 00:30:00", user = 2, typ = "click"))) // no error follows
      errors.addData(Seq(ev(20, "2024-01-01 00:05:00", user = 1, typ = "error"),
        ev(21, "2024-01-01 00:40:00", user = 1, typ = "error"))) // no click in window
      q.processAllAvailable()
      // advance both watermarks far past every lookback before expecting
      // the unmatched rows on either side to be proven matchless
      clicks.addData(Seq(ev(12, "2024-01-01 03:00:00", user = 9, typ = "click")))
      errors.addData(Seq(ev(22, "2024-01-01 03:00:00", user = 9, typ = "error")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_ssfull")
      .select(col("err_id"), col("click_id")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                 if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows.contains((20L, 10L)), s"matched pair missing: $rows")
    assert(rows.contains((21L, -1L)), s"orphan error not released: $rows")
    assert(rows.contains((-1L, 11L)), s"orphan click not released: $rows")
  }

  test("file-source streaming: readStream over parquet matches batch") {
    // copy the tiny events table into an isolated stream-input dir
    val dir = "target/test-output/stream_in"
    // fresh checkpoint each run — a stale one resumes past the input
    // and emits nothing
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/test-output/stream_ckpt"))
    val batchDf = Tables.events(spark, TestSpark.sfDir)
    batchDf.write.mode("overwrite").parquet(dir)
    val schema = batchDf.schema
    val streamed = spark.readStream.schema(schema).parquet(dir)
    val q = EventsPipeline.tumblingCounts(streamed)
      .writeStream.format("memory").queryName("t_filestream")
      .option("checkpointLocation", "target/test-output/stream_ckpt")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits windows sealed by the watermark; every
    // emitted row must match the batch result exactly
    val batch = EventsPipeline.tumblingCounts(batchDf)
      .select("bucket", "event_type", "n").as[(Long, String, Long)]
      .collect().toMap2
    val emitted = spark.table("t_filestream")
      .select("bucket", "event_type", "n").as[(Long, String, Long)].collect()
    assert(emitted.nonEmpty)
    emitted.foreach { case (b, t, n) => assert(batch((b, t)) == n) }
  }

  private implicit class Tup3Ops(rows: Array[(Long, String, Long)]) {
    def toMap2: Map[(Long, String), Long] =
      rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }

  test("streaming and batch tumblingCounts agree on the same data") {
    val evs = Seq(ev(1, "2024-01-01 00:01:00"), ev(2, "2024-01-01 00:02:00"),
      ev(3, "2024-01-01 00:07:00", typ = "buy"), ev(4, "2024-01-01 00:11:00"))
    val batch = EventsPipeline.tumblingCounts(evs.toDF())
      .select("bucket", "event_type", "n").as[(Long, String, Long)].collect().toSet
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.tumblingCounts(stream.toDF()), "t_parity")(Seq(
      evs, Seq(ev(9, "2024-01-01 02:00:00", typ = "flush"))))
    val streamed = out.select("bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(batch.subsetOf(streamed ++ batch.filter(_._2 == "flush"))
      && streamed.intersect(batch) == batch)
  }

  test("s1_tumbling gate frame: MemoryStream replay equals the batch gate") {
    // the watermark-correctness witness the verdict asked for: the REAL
    // events table (not a toy inline frame) driven through MemoryStream
    // must reproduce the s1_tumbling gate frame EXACTLY once a
    // sentinel event seals every real window. Any watermark bug that
    // drops or double-emits a window breaks set equality here while
    // the batch oracle stays green.
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    assert(evs.nonEmpty)
    val batch = graft.queries.StreamingQueries.s1Tumbling(spark, TestSpark.sfDir)
      .select("bucket", "event_type", "n", "value_sum")
      .as[(Long, String, Long, Double)].collect().toSet
    val flush = Ev(-1L, new Timestamp(evs.map(_.ts.getTime).max + 3600 * 1000L),
      0L, "flushsentinel", 0.0)
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.tumblingCounts(stream.toDF()), "t_s1_gate")(
      Seq(evs, Seq(flush)))
    val streamed = out.filter($"event_type" =!= "flushsentinel")
      .select("bucket", "event_type", "n", "value_sum")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("s4_dedup_counts gate frame: MemoryStream replay equals the batch gate") {
    val evs = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    val batch = graft.queries.StreamingQueries.s4DedupCounts(spark, TestSpark.sfDir)
      .as[(String, Long)].collect().toMap
    val stream = MemoryStream[Ev]
    // one input batch → dropDuplicatesWithinWatermark state sees every
    // event before any state eviction; Update mode emits each type's
    // final count in that batch's emission
    val out = runStream(stream,
      EventsPipeline.dedupedCounts(stream.toDF()), "t_s4_gate",
      OutputMode.Update)(Seq(evs))
    val streamed = out.groupBy("event_type").agg(max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("stream-static enrich joins each micro-batch against the dimension") {
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("user_id", "segment")
    val stream = MemoryStream[Ev]
    val out = runStream(stream,
      EventsPipeline.enrich(stream.toDF(), dim, "user_id")
        .select(col("event_id"), col("segment")), "t_enrich")(Seq(
      Seq(ev(1, "2024-01-01 00:01:00", user = 1),
        ev(2, "2024-01-01 00:02:00", user = 2)),
      Seq(ev(3, "2024-01-01 00:03:00", user = 99)) // no dimension row
    ))
    val rows = out.as[(Long, Option[String])].collect().toMap
    assert(rows == Map(1L -> Some("BUILDING"), 2L -> Some("MACHINERY"),
      3L -> None))
  }
}
