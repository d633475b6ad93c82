package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knee probe for the SimHash auto-sizing rule (round-13 verdict task
  * 8): synthesizes corpora bracketing the m=1 → m=2 threshold and
  * measures the banded join under m=1, m=2, and the auto default, so
  * the claim "the rule switches before the Σ|b|² quadratic bites" is
  * a measured row, not an extrapolation.
  *
  * OUTCOME (round 14, SCALE.md): the probe FALSIFIED the original
  * knee. At target-32 the rule switched at 2,097,152 docs, but at
  * 1.6M (still m=1 under that rule) the m=1 face measured 299 s vs
  * 36.5 s for m=2 — the quadratic bites an order of magnitude before
  * mean-bucket-32 says it should, and the r13 decade rows already
  * showed m=2 no slower even at 500-doc corpora. The default is now
  * target-2 (switch at 131,072 docs): the error is asymmetric —
  * early costs a constant key-volume factor, late costs Σ|b|².
  *
  * Corpus shape: 12 hash-derived tokens per doc from a 50k vocabulary
  * (unique per doc except planted pairs: 2 per 1,000 docs share a
  * text, so the TRUE pair count grows linearly and the candidate
  * volume is all banding, not verify output). Deterministic by
  * construction — no RNG, any engine replays it.
  *
  * Run: sbt "runMain graft.tools.SimhashKneeProbe" (≈ tens of minutes
  * at the 3.2M point under m=1 — that cost IS the finding).
  * SPARK_GRAFT_KNEE_NS overrides the doc counts (comma-separated).
  */
object SimhashKneeProbe {
  def synth(spark: SparkSession, n: Long): DataFrame = {
    // text seed: pairs of docs with id % 1000 ∈ {0,1} share a seed —
    // planted near-dups at hamming 0; everyone else is unique
    val seed = when(pmod(col("id"), lit(1000L)) < 2,
      col("id") - pmod(col("id"), lit(1000L))).otherwise(col("id"))
    val toks = (1 to 12).map { j =>
      format_string("t%d", pmod(xxhash64(col("seed") * 31 + j), lit(50000L)))
    }
    spark.range(n).select(col("id").as("doc_id"), seed.as("seed"))
      .select(col("doc_id"), concat_ws(" ", toks: _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ns = sys.env.getOrElse("SPARK_GRAFT_KNEE_NS", "1600000,3200000")
      .split(',').map(_.trim.toLong).toSeq
    ns.foreach { n =>
      val docs = synth(spark, n).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count() // materialize once so every face reads the same input
      val auto = graft.operators.Dedup.simhashSubsetForCorpus(n)
      println(s"[knee] n=$n auto rule picks m=$auto")
      def time(m: Int): Unit = {
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup
          .simhashNearDup(docs, maxHamming = 3, subset = m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val tag = if (m == auto) " (= auto choice)" else ""
        println(f"[knee] n=$n subset=$m pairs=$pairs wall=$sec%.1f s$tag")
      }
      // m=2 first (cheap), then the classic m=1 face the rule retires
      time(2); time(1)
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
