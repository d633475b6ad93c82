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
