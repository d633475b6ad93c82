package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join result equals plain join (hot-key workload)") {
    // power-law: key 1 holds 90% of left rows
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong))).toDF("k", "lv")
    val right = (1 to 9).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val b = salted.select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = ((1 to 50).map(_ => Tuple1(7L)) ++ Seq(Tuple1(1L), Tuple1(2L)))
      .toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).as[(Long, Long)].collect()
    assert(top.toSeq == Seq((7L, 50L)))
  }
}
