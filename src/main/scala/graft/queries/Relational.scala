package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** The relational/aggregate surface the reference delegates to the
  * engine above the store (SURVEY.md §2.3): IN conditions
  * (TikvFeatures.java:52-54), contains (:71-79), order-by (:66-69), and
  * every aggregate beyond COUNT (TikvTable.java:137-139 throws on all
  * others). In Spark these are native, codegen'd operators.
  *
  * Money aggregates use the exact integer-cents pattern (graft.util.Exact)
  * so results hash-match the DuckDB oracle bit-for-bit.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: wide agg surface in one pass. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sumDollars($"l_extendedprice").as("sum_base_price"),
        (sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))) / 100.0)
          .as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** MIN/MAX/AVG/COUNT-DISTINCT per group — aggregates the reference
    * store cannot push (supportsAggregateProperty=false,
    * TikvFeatures.java:119-121); partial aggregation makes this one
    * shuffle of pre-combined partials at scale.
    */
  def qAggMinmax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        (sum(cents($"o_totalprice")) / 100.0).as("sum_price"),
        countDistinct($"o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Revenue per nation: big-big shuffle join (customer ⋈ orders) plus
    * a broadcast dim join (nation) — the join-strategy split that holds
    * at 100 TB: only the dim is broadcast.
    */
  def qJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(
        (sum(cents($"o_totalprice")) / 100.0).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"n_name")
  }

  /** Top-3 orders per market segment — window row_number, the top-k-
    * per-group analytic absent from the reference (SURVEY §2.5 note).
    */
  def qTopkWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    joined.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"c_mktsegment", $"rk")
  }

  /** ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (per-partition
    * top-k then merge on driver), no full sort at scale.
    */
  def qOrderbyLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** DISTINCT — map-side partial dedup then one shuffle. */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** IN condition — `within(a,b,c)`; the reference store cannot push IN
    * (supportsQueryWithInCondition=false, TikvFeatures.java:52-54) so
    * its engine evaluates it above the scan; Spark pushes it to Parquet.
    */
  def qInCondition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** textContains — the SEARCH_INDEX analog (TikvTables.java:203-210):
    * substring predicate evaluated in the scan, no index table.
    */
  def qTextContains(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_name".contains("ol"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"))
      .orderBy($"p_brand")
  }

  /** Semi join (EXISTS) — customers having an urgent order. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Anti join (NOT EXISTS) — customers with no order above 350k. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_totalprice" > 350000.0)
      .select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Union + dedup — the `both()` set-union shape witnessed by the dual
    * edge tables (TikvTables.java:128-143).
    */
  def qUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val hi = o.filter($"o_totalprice" > 300000.0).select($"o_custkey")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    hi.union(urgent).distinct()
      .withColumnRenamed("o_custkey", "custkey")
      .orderBy($"custkey")
  }

  /** GROUP BY + HAVING — post-aggregation filter. */
  def qHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents($"o_totalprice")) / 100.0).as("total_spent"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  /** HLL++ approximate distinct (SURVEY §4.2 "free" list). The sketch
    * value itself is engine-specific (Spark's HLL++ ≠ DuckDB's), so the
    * declared output is the exact distinct plus the PROPERTY the sketch
    * must satisfy — relative error within 5 % (2 % target sd) — which
    * the oracle can assert as a constant. A broken sketch flips hll_ok
    * to false and fails the hash compare; RelationalSpec pins the bound
    * per group as well.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag", $"exact_parts", $"n_rows",
        (abs($"approx_parts" - $"exact_parts").cast("double") / $"exact_parts"
          <= 0.05).as("hll_ok"))
      .orderBy($"l_returnflag")
  }

  /** Raw SQL entry path: the same engine surface through spark.sql —
    * views registered over the parquet tables, text identical to the
    * DuckDB oracle (dialect-portable subset).
    */
  def qSqlRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(SqlRevenueText)
  }

  // 100.0 must be CAST AS DOUBLE: Spark SQL reads a bare 100.0 literal
  // as DECIMAL(3,1) (decimal division result), DuckDB as DOUBLE.
  val SqlRevenueText: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderpriority <> '5-LOW'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** analytic window suite: lag + running sum per customer's order
    * history (frames, not just ranking functions).
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .filter($"o_custkey" <= 40)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        cents($"o_totalprice").as("price_cents"))
      .withColumn("prev_order", lag($"o_orderkey", 1).over(w))
      .withColumn("running_spend",
        (sum($"price_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)) / 100.0))
      .drop("price_cents", "o_orderdate")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** RANGE-frame window: per user, each event's trailing 10-MINUTE
    * event count and value sum — the time-based frame
    * (`rangeBetween(-600, 0)` over epoch seconds) that ROWS frames
    * cannot express: the frame holds however many events fall in the
    * interval, including same-second peers. Money in exact cents.
    */
  def qTimeWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec")
      .rangeBetween(-600, 0)
    Tables.events(s, dir)
      .filter($"user_id" <= 50)
      .select($"user_id", $"event_id",
        unix_timestamp($"ts").as("ts_sec"),
        cents($"value").as("cts"))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .withColumn("window_sum", sum($"cts").over(w) / 100.0)
      .drop("cts")
      .orderBy($"user_id", $"event_id")
  }

  /** ROLLUP: subtotal + grand-total rows (NULL group keys). */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")) / 100.0).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** cube: every grouping-set combination of (status, priority) — the
    * full grouping-sets surface next to rollup's hierarchy.
    */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")) / 100.0).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** NTILE quartiles per order status — the bucketed ranking window;
    * tie-broken to a total order (cents desc, orderkey) so bucket
    * membership is engine-independent. Summarized per (status,
    * quartile) with exact-cents sums.
    */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(cents(col("o_totalprice")).desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("o_orderstatus"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
      .orderBy(col("o_orderstatus"), col("quartile"))
  }

  /** GROUPING SETS — the general form behind cube/rollup: exactly the
    * (status, priority), (status) and () groupings, with grouping_id
    * disambiguating a real NULL key from a superaggregate row (the
    * ANSI contract; both engines number the bits identically for the
    * same column order).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |  COUNT(*) AS n,
        |  SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        |    / CAST(100 AS DOUBLE) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** pivot: order counts per status × priority, priorities as columns
    * (oracle replays via conditional aggregation).
    */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .pivot($"o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .withColumnsRenamed(Map("1-URGENT" -> "p1", "2-HIGH" -> "p2",
        "3-MEDIUM" -> "p3", "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
      .orderBy($"o_orderstatus")
  }

  /** exact interpolated percentiles (both engines: continuous
    * quantile); values are sums of identical inputs → deterministic.
    */
  /** Exact per-group percentiles plus the approx_percentile (KLL-ish
    * GK sketch) cross-check: at a 100 TB length-bucketing pass the
    * exact `percentile` (sorts every group value) is off the table;
    * the mergeable sketch is the scale path. Gate pins the exact
    * values via the oracle and the sketch's rank-error bound as a
    * boolean (the q_approx_distinct pattern). l_quantity takes 50
    * distinct integer values 1..50, so the ±1% rank error can move
    * the estimate at most one value step.
    */
  def qApproxQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("apx50"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("apx90"),
        count(lit(1)).as("n"))
      .select($"l_returnflag", $"median_qty", $"p90_qty", $"n",
        (abs($"apx50" - $"median_qty") <= 1.0 &&
          abs($"apx90" - $"p90_qty") <= 1.0).as("sketch_ok"))
      .orderBy($"l_returnflag")
  }

  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** group-wise top-k via the map-side TopKAggregator (same answer as
    * q_topk_window through a shuffle-light plan: the shuffle carries at
    * most k rows per group per input partition, not every row — see
    * graft.functions.TopKAggregator).
    */
  def qTopkAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .select($"c_mktsegment", $"o_orderkey", cents($"o_totalprice").as("price_cents"))
    graft.functions.TopKAggregator
      .topKPerGroup(joined, Seq("c_mktsegment"), "price_cents", "o_orderkey", 3)
      .select($"c_mktsegment", $"rank", $"o_orderkey",
        ($"price_cents" / 100.0).as("o_totalprice"))
      .orderBy($"c_mktsegment", $"rank")
  }

  /** Bucketed range join: events (points = value) against 2000
    * deterministically-derived price bands (no equi-key) — the plan
    * must be a hash equi-join on the bucket id, never a
    * BroadcastNestedLoopJoin (PlanSpec pins this).
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val intervals = Tables.part(s, dir).select(
      col("p_partkey").as("interval_id"),
      ((col("p_partkey") * 7) % 480).cast("double").as("lo"),
      ((col("p_partkey") * 7) % 480 + 1 + col("p_partkey") % 13)
        .cast("double").as("hi"))
    // pre-project the fact side: every point column rides through the
    // banded join, whose OUTPUT is the dominant volume here (dense
    // fixed value domain → each point matches ~0.6% of all intervals,
    // so output grows linearly with the interval count) — carrying the
    // events row's props JSON through a 10×-interval join measured
    // 16.6× instead of ~linear (SCALE.md round-9 table). Width 4 vs 16
    // trades a ~2.5× interval explode for 120 buckets (full local[32]
    // parallelism; was 31) and 2.6× fewer residual-filter misses.
    graft.operators.RangeJoin.pointInInterval(
        Tables.events(s, dir).select(col("value")), "value",
        intervals, "lo", "hi",
        bucketWidth = 4.0)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_points"),
        (sum(cents(col("value"))) / 100.0).as("value_sum"))
      .orderBy(col("interval_id"))
  }

  /** Bloom-pruned exact semi-join: lineitems of high-value orders,
    * rolled up per return flag. The bloom pass is a superset filter;
    * the trailing exact semi-join makes the result identical to a
    * plain semi-join — which is exactly what the oracle runs.
    */
  def qBloomSemi(s: SparkSession, dir: String): DataFrame = {
    val highValue = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
    graft.operators.BloomPrune.semiJoin(
        Tables.lineitem(s, dir), "l_orderkey",
        highValue, "o_orderkey",
        expectedItems = 100000L, numBits = 1L << 20)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** Incremental aggregate maintenance: the orders table split into a
    * "base" (pre-1996) and a "delta" (1996+), aggregated SEPARATELY
    * and merged state-to-state — the result must equal the one-pass
    * aggregate over everything, which is what the oracle computes.
    */
  def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Incremental
    val orders = Tables.orders(s, dir)
    val cut = "1996-01-01"
    val base = Incremental.aggState(
      orders.filter(col("o_orderdate") < lit(cut)),
      Seq("o_orderpriority"), col("o_totalprice"))
    val delta = Incremental.aggState(
      orders.filter(col("o_orderdate") >= lit(cut)),
      Seq("o_orderpriority"), col("o_totalprice"))
    Incremental.report(
        Incremental.merge(Seq("o_orderpriority"), base, delta),
        Seq("o_orderpriority"))
      .orderBy(col("o_orderpriority"))
  }

  /** Top-10 most frequent part keys with the count-min-sketch
    * cross-check: exact counts oracled in DuckDB, the sketch's
    * one-sided bound pinned as a boolean (the q_approx_distinct
    * pattern for frequency instead of cardinality).
    */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.heavyHitters(
        Tables.lineitem(s, dir).select(col("l_partkey")), "l_partkey",
        k = 10)
      .orderBy(col("n_exact").desc, col("l_partkey"))

  /** Salted fact⋈dim join, end to end: lineitem scatters across 8
    * deterministic replicas of the supplier side (Skew.saltedJoin —
    * the explicit tool for keys so hot that even AQE's split
    * partitions overwhelm a task), then the usual exact-cents
    * aggregate. The oracle is the PLAIN join — the gate IS the
    * semantics-preservation witness that salting only moves rows
    * between tasks, never in or out of the result.
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.Skew.saltedJoin(l, sup, "suppkey", salt = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        (sum(cents(col("l_quantity"))) / 100.0).as("total_qty"))
      .orderBy(col("s_nationkey"))
  }

  /** Correlation / covariance / stddev per group via EXACT integer
    * moment sums — the scale-safe replacement for the built-in
    * `corr`/`covar_samp` aggregates, whose float accumulation is
    * partition-order sensitive (different shuffle → different low
    * bits → an un-oracle-able result). Here the ONE aggregation pass
    * collects exact BIGINT moments (n, Σx, Σy, Σxy, Σx², Σy² — all
    * map-side combinable, one shuffle), and every derived statistic is
    * a single deterministic double expression per group evaluated once
    * at the very end — the same op order the oracle replays, so even
    * the float outputs hash-match. x = quantity, y = whole-dollar
    * price (floored so y² sums stay in BIGINT range through sf10).
    */
  def qCorrMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val m = Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("x"),
        floor($"l_extendedprice").cast("long").as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .select($"l_returnflag", $"n", $"sx", $"sy", $"sxy", $"sxx", $"syy",
        (d($"n") * d($"sxx") - d($"sx") * d($"sx")).as("dx"),
        (d($"n") * d($"syy") - d($"sy") * d($"sy")).as("dy"),
        (d($"n") * d($"sxy") - d($"sx") * d($"sy")).as("dxy"))
    m.select($"l_returnflag", $"n", $"sx", $"sy", $"sxy", $"sxx", $"syy",
        round($"dxy" / sqrt($"dx" * $"dy"), 6).as("corr"),
        round($"dxy" / $"n" / ($"n" - 1), 6).as("covar_samp"),
        round(sqrt($"dx" / $"n" / ($"n" - 1)), 6).as("stddev_x"),
        round(sqrt($"dy" / $"n" / ($"n" - 1)), 6).as("stddev_y"))
      .orderBy($"l_returnflag")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corr_moments" -> (qCorrMoments _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_bloom_semi" -> (qBloomSemi _),
    "q_incremental_agg" -> (qIncrementalAgg _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_approx_quantile" -> (qApproxQuantile _),
    "q_topk_agg" -> (qTopkAgg _),
    "q_window_running" -> (qWindowRunning _),
    "q_time_window" -> (qTimeWindow _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_ntile" -> (qNtile _),
    "q_pivot" -> (qPivot _),
    "q_percentile" -> (qPercentile _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_sql_revenue" -> (qSqlRevenue _),
    "q1_agg" -> (q1Agg _),
    "q_agg_minmax" -> (qAggMinmax _),
    "q_join_revenue" -> (qJoinRevenue _),
    "q_topk_window" -> (qTopkWindow _),
    "q_orderby_limit" -> (qOrderbyLimit _),
    "q_distinct" -> (qDistinct _),
    "q_in_condition" -> (qInCondition _),
    "q_text_contains" -> (qTextContains _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_union" -> (qUnion _),
    "q_having" -> (qHaving _),
  )

  val oracle: Map[String, String] = Map(
    // identical exact-integer moments, identical derived-double op
    // order — the float statistics hash-match because every divide /
    // sqrt happens once per group on bit-identical inputs
    "q_corr_moments" ->
      """SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
        |  round(dxy / sqrt(dx * dy), 6) AS corr,
        |  round(dxy / n / (n - 1), 6) AS covar_samp,
        |  round(sqrt(dx / n / (n - 1)), 6) AS stddev_x,
        |  round(sqrt(dy / n / (n - 1)), 6) AS stddev_y
        |FROM (
        |  SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dxy
        |  FROM (
        |    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |      CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |      CAST(SUM(x * y) AS BIGINT) AS sxy,
        |      CAST(SUM(x * x) AS BIGINT) AS sxx,
        |      CAST(SUM(y * y) AS BIGINT) AS syy
        |    FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |          CAST(FLOOR(l_extendedprice) AS BIGINT) AS y FROM lineitem)
        |    GROUP BY l_returnflag))
        |ORDER BY l_returnflag""".stripMargin,
    // the PLAIN join: equality proves the salt scatter/replicate is
    // semantics-preserving
    "q_salted_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         |  ${sqlSumDollars("l_quantity")} AS total_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  COUNT(*) AS n, true AS sketch_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // exact top-10 with deterministic tie-break; cms_ok is Spark-side
    // verified (the sketch bound), constant-true for the oracle
    "q_heavy_hitters" ->
      """SELECT l_partkey, COUNT(*) AS n_exact, true AS cms_ok
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY n_exact DESC, l_partkey LIMIT 10""".stripMargin,
    // ONE-pass aggregate over the whole table — the merged split
    // states must reproduce it exactly
    "q_incremental_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS total,
        |  MIN(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS min_val,
        |  MAX(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS max_val
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  SUM(CAST(ROUND((l_extendedprice)*100) AS BIGINT))/100.0 AS revenue
        |FROM lineitem WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // straightforward BETWEEN theta-join: DuckDB's IEJoin handles it
    // directly; Spark's bucketed equi-join must produce the same rows
    "q_range_join" ->
      """WITH iv AS (SELECT p_partkey AS interval_id,
        |    CAST((p_partkey * 7) % 480 AS DOUBLE) AS lo,
        |    CAST((p_partkey * 7) % 480 + 1 + p_partkey % 13 AS DOUBLE) AS hi
        |  FROM part)
        |SELECT interval_id, COUNT(*) AS n_points,
        |  SUM(CAST(ROUND((value)*100) AS BIGINT))/100.0 AS value_sum
        |FROM events JOIN iv ON value >= lo AND value <= hi
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(*) AS n_rows, true AS hll_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_topk_agg" ->
      """SELECT c_mktsegment, rank, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, cents/100.0 AS o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY cents DESC, o_orderkey ASC) AS INT) AS rank
        |  FROM (SELECT c_mktsegment, o_orderkey,
        |          CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
        |        FROM orders JOIN customer ON o_custkey = c_custkey)
        |) WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_orderkey, 1) OVER w AS prev_order,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
        |    AS running_spend
        |FROM orders WHERE o_custkey <= 40
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // RANGE frame over epoch seconds: same-second peers are in-frame
    // for each other in both engines (RANGE peer semantics)
    "q_time_window" ->
      """SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |  COUNT(*) OVER w AS n_in_window,
        |  SUM(CAST(ROUND((value)*100) AS BIGINT)) OVER w / 100.0 AS window_sum
        |FROM events WHERE user_id <= 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderstatus, quartile, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT)/100.0 AS total
        |FROM (SELECT o_orderstatus, o_orderkey,
        |        CAST(ROUND((o_totalprice)*100) AS BIGINT) AS cents,
        |        CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
        |          ORDER BY CAST(ROUND((o_totalprice)*100) AS BIGINT) DESC,
        |          o_orderkey) AS INT) AS quartile
        |      FROM orders)
        |GROUP BY o_orderstatus, quartile
        |ORDER BY o_orderstatus, quartile""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT)) AS BIGINT)/100.0
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
        |  CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sql_revenue" -> SqlRevenueText,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  SUM(CAST(ROUND((l_extendedprice)*100) AS BIGINT))/100.0 AS sum_base_price,
        |  SUM(CAST(ROUND((l_extendedprice*(1.0-l_discount))*100) AS BIGINT))/100.0 AS sum_disc_price,
        |  SUM(l_quantity)/COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_minmax" ->
      """SELECT o_orderpriority,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS sum_price,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_revenue" ->
      """SELECT n_name,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_topk_window" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_in_condition" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_text_contains" ->
      """SELECT p_brand, COUNT(*) AS n FROM part
        |WHERE p_name LIKE '%ol%'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_union" ->
      """SELECT DISTINCT o_custkey AS custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY custkey""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  SUM(CAST(ROUND((o_totalprice)*100) AS BIGINT))/100.0 AS total_spent
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin,
  )
}
