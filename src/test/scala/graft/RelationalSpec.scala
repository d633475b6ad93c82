package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within its 2% rsd bound (5 sigma)") {
    val approx = graft.queries.Relational.qApproxDistinct(spark, TestSpark.sfDir)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n")).as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.10,
        s"flag $k: approx ${approx(k)} vs exact $n")
    }
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
