package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId classifies clear-cut sentences") {
    val df = Seq(
      (1L, "the cat and the dog sat in the garden with all of the birds"),
      (2L, "der hund und die katze sind nicht in das haus und der garten"),
      (3L, "el perro y la gata que viven en la casa de los abuelos"),
      (4L, "le chien et les chats sont dans une maison avec des oiseaux"),
      (5L, "xyzzy plugh qwerty")) // no profile hits
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
    val got = df.as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "de")
    assert(got(3L) == "es"); assert(got(4L) == "fr")
    assert(got(5L) == "und")
  }

  test("token counts and fingerprint canonicalization") {
    val df = Seq(("a  b\tc", "A b   c")).toDF("t1", "t2").select(
      TextAnalysis.tokenCount(col("t1")).as("n1"),
      TextAnalysis.fingerprint(col("t1")).as("f1"),
      TextAnalysis.fingerprint(col("t2")).as("f2"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == r.getString(2)) // case+ws canonical
  }

  test("quality score is bounded and monotone-ish in length") {
    val df = Seq(
      (1L, "short"),
      (2L, ("the quick brown fox is on the hill and " * 10).trim))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
    val got = df.as[(Long, Double)].collect().toMap
    assert(got.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(2L) > got(1L))
  }

  test("bpeish count: alpha runs + digits + punct") {
    val n = Seq("ab 12 c!").toDF("text")
      .select(TextAnalysis.bpeishCount(col("text")).as("n"))
      .as[Long].collect()(0)
    assert(n == 5) // "ab", "1", "2", "c", "!"
  }
}
