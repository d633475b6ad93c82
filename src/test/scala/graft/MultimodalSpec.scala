package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq((0L, "hello world"), (1L, "abc"), (2L, "x" * 200))
    .toDF("doc_id", "text")

  test("media table kinds cycle deterministically") {
    val kinds = Multimodal.mediaTable(docs).select("media_id", "kind")
      .as[(Long, String)].collect().toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("decode stub features are deterministic and sized right") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes == 11)
    assert(feats(0L).feature.length == 8)
    assert(feats(2L).n_frames == 200 / 64) // video: 64-byte "frames"
    val again = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(feats.map { case (k, v) => k -> v.checksum } == again)
  }

  test("metadata-only scan does not touch the bytes column") {
    val plan = Multimodal.metaOnly(Multimodal.mediaTable(docs))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes"))
  }

  test("tileGrid: clamped ceil grid; bytes column never read") {
    val tiles = Multimodal.tileGrid(Multimodal.mediaTable(docs), 224)
    assert(!tiles.queryExecution.optimizedPlan.toString.contains("bytes"))
    val byId = tiles.select("media_id", "width", "height", "n_tiles")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    byId.values.foreach { case (_, w, h, n) =>
      assert(n == ((w + 223) / 224).toLong * ((h + 223) / 224).toLong)
    }
    assert(byId.nonEmpty)
  }

  test("header round-trip: decodeHeader parses withHeader's real bytes") {
    val media = Multimodal.withHeader(Multimodal.mediaTable(docs))
    // the raw blob really starts with the 4 magic bytes + BE words
    val raw = media.filter($"media_id" === 0L)
      .select("bytes").as[Array[Byte]].head()
    assert(new String(raw.take(4), "UTF-8") == "GRFT")
    assert(((raw(4) & 0xff) << 8 | (raw(5) & 0xff)) == 320) // width u16be
    val decoded = Multimodal.decodeHeader(media)
      .select("media_id", "magic", "width", "height", "sample_rate", "n_bytes")
      .as[(Long, String, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    val meta = Multimodal.mediaTable(docs)
      .select("media_id", "width", "height", "sample_rate")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    decoded.foreach { case (id, (_, magic, w, h, sr, n)) =>
      assert(magic == "GRFT")
      assert((w, h, sr) == (meta(id)._2, meta(id)._3, meta(id)._4))
      assert(n >= 0)
    }
    assert(decoded(0L)._6 == 11) // payload length excludes the header
  }

  test("frame sample counts ceil(n_bytes/stride)") {
    val got = Multimodal.frameSample(Multimodal.mediaTable(docs), stride = 64)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(2L -> 4)) // 200 bytes → ceil(200/64)=4
  }
}
