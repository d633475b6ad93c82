package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long, width: Long) =
    Packing.packSequences(rows.toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), budget, width)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_first", "pack_offset", "n_packs")
      .as[(Long, Long, Long, Long, Long)].collect()

  test("hand-computed layout: docs straddle pack boundaries") {
    // budget 10, docs of 4,4,4,9,1 tokens → offsets 0,4,8,12,21
    val got = pack(Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 9L), (5L, 1L)), 10L, 2L)
    assert(got.toSeq == Seq(
      (1L, 4L, 0L, 0L, 1L),  // [0,4) in pack 0
      (2L, 4L, 0L, 4L, 1L),  // [4,8) in pack 0
      (3L, 4L, 0L, 8L, 2L),  // [8,12) straddles packs 0–1
      (4L, 9L, 1L, 2L, 2L),  // [12,21) straddles packs 1–2
      (5L, 1L, 2L, 1L, 1L))) // [21,22) in pack 2
  }

  test("layout is invariant to bucketWidth and input partitioning") {
    val rows = (0L until 500L).map(i => (i * 3 + (i % 7), (i % 37) + 1))
    val ref = pack(rows, 64L, 1L << 20).toSeq
    assert(pack(rows, 64L, 1L).toSeq == ref)
    assert(pack(rows, 64L, 17L).toSeq == ref)
    val repart = Packing.packSequences(
      rows.toDF("doc_id", "toks").repartition(13),
      col("doc_id"), col("toks"), 64L, 17L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_first", "pack_offset", "n_packs")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(repart == ref)
  }

  test("offsets are contiguous and packs are exactly budget-sized") {
    val rows = (0L until 300L).map(i => (i, (i % 29) + 1))
    val got = pack(rows, 100L, 32L)
    var expectStart = 0L
    got.foreach { case (_, toks, packFirst, packOff, nPacks) =>
      val start = packFirst * 100L + packOff
      assert(start == expectStart)
      assert(packOff >= 0 && packOff < 100L)
      assert(nPacks == (start + toks - 1) / 100L - start / 100L + 1)
      expectStart += toks
    }
  }

  test("slidingChunks: every token covered, strides and lens exact") {
    val rows = Seq((1L, 5L), (2L, 64L), (3L, 65L), (4L, 200L), (5L, 0L))
    val got = Packing.slidingChunks(rows.toDF("doc_id", "toks"),
        col("doc_id"), col("toks"), window = 128L, stride = 64L)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 5L),
      (2L, 0L, 0L, 64L),
      (3L, 0L, 0L, 65L), (3L, 1L, 64L, 1L),
      (4L, 0L, 0L, 128L), (4L, 1L, 64L, 128L), (4L, 2L, 128L, 72L),
      (4L, 3L, 192L, 8L),
      // doc 5 (0 tokens) emits no chunks
    ))
    // invariants on a larger spread: starts stride-aligned, len > 0,
    // last chunk reaches exactly n_tokens
    val big = (0L until 200L).map(i => (i, i % 300))
    val chunks = Packing.slidingChunks(big.toDF("doc_id", "toks"),
        col("doc_id"), col("toks"), window = 128L, stride = 64L)
      .select("doc_id", "n_tokens", "chunk_id", "chunk_start", "chunk_len")
      .as[(Long, Long, Long, Long, Long)].collect()
    chunks.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._3)
      sorted.zipWithIndex.foreach { case ((_, n, cid, start, len), i) =>
        assert(cid == i && start == i * 64L)
        assert(len > 0 && len <= 128L)
        assert(len == math.min(128L, n - start))
      }
      val (_, n, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n)
    }
  }
}
