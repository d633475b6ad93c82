package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** heavyHitters key-type genericity + the count-min one-sided bound:
  * the operator must work for any key type `count_min_sketch` accepts
  * (not just BIGINT) and for column names that need quoting.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("heavyHitters over a string key with a non-identifier column name") {
    val df = (Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(5)("c"))
      .toDF("doc lang") // space forces backtick quoting inside expr()
    val got = Sketches.heavyHitters(df, "doc lang", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("alpha", 30L, true), ("beta", 20L, true)))
  }

  test("heavyHitters over an int key keeps the column's type") {
    val df = (Seq.fill(10)(7) ++ Seq.fill(4)(9)).toDF("k")
    val out = Sketches.heavyHitters(df, "k", k = 1)
    assert(out.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val r = out.collect().head
    assert(r.getInt(0) == 7 && r.getLong(1) == 10L && r.getBoolean(2))
  }

  test("heavyHitters long-key path matches the q_heavy_hitters contract") {
    val df = (Seq.fill(8)(100L) ++ Seq.fill(3)(200L)).toDF("id")
    val got = Sketches.heavyHitters(df, "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((100L, 8L, true), (200L, 3L, true)))
  }
}
