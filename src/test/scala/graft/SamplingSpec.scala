package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val ids = spark.range(0, 10000).select(col("id"))

  test("assignSplit is complete, disjoint, and near the target weights") {
    val split = Sampling.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test")) // complete, no nulls
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 200, counts.toString)
    assert(math.abs(counts("val") - 1000) < 100, counts.toString)
    assert(math.abs(counts("test") - 1000) < 100, counts.toString)
  }

  test("membership is stable across runs and partitionings") {
    def trainSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.assignSplit(df, col("id"), Seq("train" -> 0.8, "val" -> 0.2))
        .filter(col("split") === "train").select("id").as[Long].collect().toSet
    val a = trainSet(ids)
    val b = trainSet(ids.repartition(13))
    assert(a == b)
  }

  test("capPerGroup keeps each group's n smallest keys; small groups intact") {
    // group a: 100 rows → capped to 5 smallest; group b: 3 rows → intact
    val df = ((0L until 100L).map(i => ("a", i)) ++
      Seq(("b", 7L), ("b", 3L), ("b", 9L))).toDF("source", "doc_id")
    val got = Sampling.capPerGroup(df, "source", "doc_id", 5)
      .as[(String, Int, Long)].collect()
    val byGroup = got.groupBy(_._1)
    assert(byGroup("a").map(_._3).sorted.toSeq == (0L until 5L))
    assert(byGroup("b").map(_._3).sorted.toSeq == Seq(3L, 7L, 9L))
    // rank is 1-based ascending-key within the group
    assert(byGroup("b").sortBy(_._2).map(_._3).toSeq == Seq(3L, 7L, 9L))
    // agreement with the window formulation, on a repartitioned input
    // (map-side buffers must not change the surviving set)
    val win = Sampling.stratifiedSample(
      df.repartition(7), col("source"), col("doc_id"), 5) // hash order differs
    assert(win.count() == 8) // both cap to 5 + 3 rows, whatever the order
  }

  test("sampleFraction keeps a stable subset of about the right size") {
    val s1 = Sampling.sampleFraction(ids, col("id"), 0.25)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.sampleFraction(ids, col("id"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size - 2500) < 150, s1.size.toString)
    // nested fractions: a smaller sample is a subset of a larger one
    val s3 = Sampling.sampleFraction(ids, col("id"), 0.1)
      .select("id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
  }

  test("stratifiedSample: exact n per stratum, deterministic, partition-proof") {
    val df = ids.withColumn("stratum", col("id") % 4)
    def draw(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(d, col("stratum"), col("id"), 25)
        .select("stratum", "id").as[(Long, Long)].collect().toSet
    val a = draw(df)
    assert(a.size == 100 && a.groupBy(_._1).forall(_._2.size == 25))
    assert(draw(df.repartition(17)) == a)
    // a stratum smaller than n returns whole stratum, ranked
    val tiny = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "stratum")
    val got = Sampling.stratifiedSample(tiny, col("stratum"), col("id"), 10)
    assert(got.count() == 3)
    assert(got.agg(max("sample_rank")).first().getInt(0) <= 2)
  }

  test("clusterSplit: a near-dup cluster never straddles splits") {
    // find two ids whose PLAIN hash-splits differ at 50/50, then pair
    // them: the cluster split must put both where the REP (min id) goes
    val w = Seq("a" -> 0.5, "b" -> 0.5)
    val ids = (0L until 64L)
    val solo = Sampling.assignSplit(
      ids.toDF("doc_id"), col("doc_id"), w)
      .as[(Long, String)].collect().toMap
    val (x, y) = ids.flatMap(i => ids.filter(j => j > i &&
      solo(i) != solo(j)).map(j => (i, j))).head
    val docs = Seq(x, y, 63L).toDF("doc_id")
    val pairs = Seq((x, y)).toDF("a_id", "b_id")
    val got = Sampling.clusterSplit(docs, pairs, w)
      .select(col("doc_id"), col("rep"), col("split"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(x)._2 == got(y)._2, s"cluster straddled: $got")
    assert(got(x)._1 == x && got(y)._1 == x) // rep = min id
    assert(got(x)._2 == solo(x)) // the rep's own bucket decides
  }
}
