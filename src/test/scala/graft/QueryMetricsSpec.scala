package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.QueryMetrics

class QueryMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("listener observes row count, scan totals, and duration of an action") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
    val expected = orders.filter(col("o_orderkey") <= 500L).count()
    val recs = QueryMetrics.capture(spark) {
      orders.filter(col("o_orderkey") <= 500L)
        .write.format("noop").mode("overwrite").save()
    }
    val r = recs.filterNot(_.failed).find(_.outputRows.isDefined).get
    assert(r.outputRows.contains(expected))
    assert(r.durationNs > 0)
    // the parquet scan touched at least the delivered rows and read bytes
    assert(r.scanRows >= expected && r.scanBytes > 0)
  }

  test("failed action is recorded as failed") {
    import spark.implicits._
    val recs = QueryMetrics.capture(spark) {
      intercept[Exception] {
        Seq(1, 0).toDF("d").select((lit(10) / col("d")).as("q"))
          .filter(assert_true(col("q") < 100).isNull)
          .write.format("noop").mode("overwrite").save()
      }
      ()
    }
    assert(recs.nonEmpty)
  }

  test("recorder only sees actions inside its capture window") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
    orders.limit(1).count() // outside any capture
    val recs = QueryMetrics.capture(spark) {
      orders.limit(3).write.format("noop").mode("overwrite").save()
    }
    assert(recs.filterNot(_.failed).flatMap(_.outputRows).forall(_ <= 3))
  }
}
