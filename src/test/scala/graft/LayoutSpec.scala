package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: hand-computed interleave") {
    // x=3 (011), y=5 (101) → z bits x2 y2 x1 y1 x0 y0 = 011011 = 27
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4)).as[Long].head()
    assert(z == 27L)
    // masking: only the low `bits` bits participate
    val z2 = Seq((3L + 16L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4)).as[Long].head()
    assert(z2 == 27L)
  }

  test("zOrder clusters both dimensions: disjoint z-ranges, tight boxes") {
    val n = 4096
    val df = (0 until n).map { i => (i.toLong % 64, (i.toLong * 31) % 64) }
      .toDF("x", "y")
    val parts = Layout.zOrder(df, "x", "y", bits = 6, numPartitions = 8)
      .select(col("__z"), spark_partition_id().as("pid"), col("x"), col("y"))
      .groupBy(col("pid"))
      .agg(min("__z").as("zlo"), max("__z").as("zhi"),
        min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi"), count(lit(1)).as("cnt"))
      .collect()
    assert(parts.length > 1)
    // range partitioning on __z ⇒ partition z-intervals don't overlap
    val sorted = parts.sortBy(_.getAs[Long]("zlo"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("zhi") <= b.getAs[Long]("zlo"))
    case _ => }
    // the payoff: every partition's x AND y bounding box is a strict
    // subset of the full 0..63 domain (a single-column sort would
    // leave the other dimension spanning the whole domain everywhere)
    val tightX = sorted.count(r =>
      r.getAs[Long]("xhi") - r.getAs[Long]("xlo") <= 40)
    val tightY = sorted.count(r =>
      r.getAs[Long]("yhi") - r.getAs[Long]("ylo") <= 40)
    assert(tightX >= sorted.length / 2 && tightY >= sorted.length / 2,
      sorted.map(_.toString).mkString("\n"))
  }
}
