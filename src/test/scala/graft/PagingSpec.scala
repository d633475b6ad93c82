package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Paging

class PagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("page/nextToken iterate the full sorted relation without overlap") {
    val df = spark.range(0, 97).select((col("id") * 13 % 101).as("k"), col("id"))
    var token: Option[Any] = None
    var seen = Vector.empty[Long]
    var pages = 0
    var done = false
    while (!done) {
      val p = Paging.page(df, "k", token, 10)
      token = Paging.nextToken(p, "k")
      if (token.isEmpty) done = true
      else { seen ++= p.select("k").as[Long].collect(); pages += 1 }
    }
    assert(pages == 10) // 97 rows / 10 per page
    assert(seen == seen.sorted && seen.distinct.size == 97)
  }

  test("empty relation yields no token") {
    val df = Seq.empty[Long].toDF("k")
    assert(Paging.nextToken(Paging.page(df, "k", None, 5), "k").isEmpty)
  }

  test("stitched pages equal the sorted prefix") {
    val df = spark.range(0, 40).select((col("id") * 7 % 41).as("k"))
    val got = Paging.stitch(df, "k", n = 15, pages = 2)
      .select("k").as[Long].collect().sorted
    val want = df.orderBy("k").limit(30).select("k").as[Long].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("shardPage resumes inside the slice and clips to the shard bounds") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    // shard [20, 60), token 35 → rows 36..45
    val got = Paging.shardPage(df, "k", 20L, 60L, Some(35L), 10)
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (36L to 45L))
    // near the upper bound the page clips: token 55 → rows 56..59 only
    val clipped = Paging.shardPage(df, "k", 20L, 60L, Some(55L), 10)
      .select("k").as[Long].collect().sorted
    assert(clipped.toSeq == (56L to 59L))
    // no token = the shard's first page
    val first = Paging.shardPage(df, "k", 20L, 60L, None, 5)
      .select("k").as[Long].collect().sorted
    assert(first.toSeq == (20L to 24L))
  }

  test("shardPage rejects a token outside the shard slice") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    val below = intercept[IllegalArgumentException] {
      Paging.shardPage(df, "k", 20L, 60L, Some(5L), 10)
    }
    assert(below.getMessage.contains("below the shard lower bound"))
    val above = intercept[IllegalArgumentException] {
      Paging.shardPage(df, "k", 20L, 60L, Some(60L), 10)
    }
    assert(above.getMessage.contains("upper bound"))
  }

  test("resume filter pushes to parquet and page plans TakeOrderedAndProject") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
    val p = Paging.page(orders.select(col("o_orderkey"), col("o_custkey")),
      "o_orderkey", Some(5000L), 50)
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(plan.contains("GreaterThan(o_orderkey,5000)"), s"plan:\n$plan")
  }
}
