package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter: zero false negatives, bounded false positives") {
    val keys = (0L until 1000L).toDF("k")
    val bytes = BloomPrune.buildFilter(keys, col("k"),
      expectedItems = 1000L, numBits = 1L << 16) // ~65 bits/item
    // every inserted key passes (no false negatives — the contract
    // that makes the prune safe)
    val inHits = keys.filter(BloomPrune.mightContain(bytes, col("k"))).count()
    assert(inHits == 1000L)
    // disjoint probe keys: fpp at 65 bits/item is well under 1%
    val out = (100000L until 110000L).toDF("k")
    val fp = out.filter(BloomPrune.mightContain(bytes, col("k"))).count()
    assert(fp < 100L, s"false positives: $fp / 10000")
  }

  test("bloom semiJoin is exact: equals the plain semi-join") {
    val fact = (0L until 5000L).map(i => (i, i % 97)).toDF("id", "key")
    val dim = Seq(3L, 13L, 42L, 96L, 500L).toDF("key")
    val got = BloomPrune.semiJoin(fact, "key", dim, "key",
      expectedItems = 10L, numBits = 1L << 12)
      .select("id", "key").orderBy("id").as[(Long, Long)].collect()
    val want = fact.join(dim, Seq("key"), "left_semi")
      .select("id", "key").orderBy("id").as[(Long, Long)].collect()
    assert(got.sameElements(want) && got.nonEmpty)
  }

  test("probe predicate is codegen'd (no UDF in the plan)") {
    val keys = (0L until 10L).toDF("k")
    val bytes = BloomPrune.buildFilter(keys, col("k"), 10L, 1L << 10)
    // probe over a Range source — a local relation would constant-fold
    // the whole filter at optimize time and hide the predicate
    val plan = spark.range(100).toDF("k")
      .filter(BloomPrune.mightContain(bytes, col("k")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan)
  }
}
