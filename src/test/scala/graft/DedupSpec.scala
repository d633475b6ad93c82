package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the green field"
  private val nearDup = base.replace("green", "wet") // 1-word change
  private val distinct1 =
    "completely different content about spark catalyst optimizer internals and codegen"
  private val distinct2 =
    "unrelated words describing graphs vertices edges and traversal semantics here"

  lazy val docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2),
    (4L, base), // exact copy of 0
    (5L, "  the   quick brown fox jumps over the lazy dog while rain falls on the green field ") // ws-variant of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups exact + whitespace-canonical copies") {
    val res = Dedup.exact(docs).collect()
    val byKeep = res.map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(byKeep(0L) == 3) // docs 0, 4, 5 share a fingerprint
    assert(res.length == 4)
  }

  test("minhash near-dup finds the planted pair and not the distinct docs") {
    val pairs = Dedup.minhashNearDup(docs, k = 3, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 4L))) // near/exact pair found
    assert(pairs.contains((0L, 4L)) && pairs.contains((0L, 5L))) // exact copies always collide
    assert(!pairs.exists(p => Set(p._1, p._2).contains(2L) && Set(p._1, p._2).contains(3L)))
  }

  // SimHash hamming ≈ 64·θ/π, so hamming ≤ 3 needs ~99% token overlap:
  // use 400-token docs with a single token changed.
  private val longBase = (0 until 400).map(i => s"tok$i").mkString(" ")
  private val longNear = longBase.replace("tok7 ", "changed ")
  private val longOther = (0 until 400).map(i => s"other$i").mkString(" ")
  lazy val longDocs = Seq((0L, longBase), (1L, longNear), (2L, longOther),
    (3L, longBase)).toDF("doc_id", "text")

  test("simhash: exact copies identical; 99%-overlap docs within hamming 3") {
    val sigs = Dedup.simhash(longDocs).as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L))
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(1L)) <= 3)
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) > 3)
  }

  test("simhash near-dup banding surfaces the planted pair") {
    val pairs = Dedup.simhashNearDup(longDocs, maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => Set(p._1, p._2).contains(2L) && p._1 != p._2))
  }

  test("dedupDocuments keeps one representative per near-dup cluster") {
    val kept = Dedup.dedupDocuments(docs, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L)) // smallest id of the cluster survives
    assert(!kept.contains(4L) && !kept.contains(5L))
    assert(kept.contains(2L) && kept.contains(3L))
  }

  test("jaccard pairs: exact copies score 1.0") {
    val j = Dedup.jaccardPairs(docs, k = 1, threshold = 0.9, maxDocId = 10)
      .filter(col("a_id") === 0 && col("b_id") === 4)
      .select("jaccard").as[Double].collect()
    assert(j.toSeq == Seq(1.0))
  }
}
