package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within its 2% rsd bound (5 sigma)") {
    val rows = graft.queries.Relational.qApproxDistinct(spark, TestSpark.sfDir)
      .select("l_returnflag", "exact_parts", "hll_ok")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, n, ok) =>
      assert(ok, s"flag $k: sketch outside 5% of exact $n")
    }
  }

  test("RANGE time-window frame includes same-second peers both ways") {
    import java.sql.Timestamp
    // user 1: events at t=0s, 300s, 300s (peers), 700s — the 600 s
    // trailing frame at t=700 holds both 300 s peers but not t=0;
    // the two peers see EACH OTHER (RANGE peer semantics, unlike ROWS)
    val df = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, 11L, Timestamp.valueOf("2024-01-01 00:05:00"), 2.0),
      (1L, 12L, Timestamp.valueOf("2024-01-01 00:05:00"), 4.0),
      (1L, 13L, Timestamp.valueOf("2024-01-01 00:11:40"), 8.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_sec").rangeBetween(-600, 0)
    val got = df.select($"user_id", $"event_id",
        unix_timestamp($"ts").as("ts_sec"), $"value")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum", sum($"value").over(w))
      .select($"event_id", $"n", $"sum")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(10L) == ((1L, 1.0)))
    assert(got(11L) == ((3L, 7.0))) // includes its same-second peer
    assert(got(12L) == ((3L, 7.0)))
    assert(got(13L) == ((3L, 14.0))) // t=0 aged out; both peers in
  }

  test("TopKAggregator matches the window row_number formulation") {
    val viaAgg = graft.queries.Relational.qTopkAgg(spark, TestSpark.sfDir)
      .select("c_mktsegment", "rank", "o_orderkey")
      .as[(String, Int, Long)].collect().toSet
    val viaWindow = graft.queries.Relational.qTopkWindow(spark, TestSpark.sfDir)
      .select("c_mktsegment", "rk", "o_orderkey")
      .as[(String, Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("sql entry path and DataFrame path agree") {
    val sql = graft.queries.Relational.qSqlRevenue(spark, TestSpark.sfDir)
      .collect().map(_.toSeq)
    assert(sql.nonEmpty && sql.forall(_.length == 3))
  }
}
