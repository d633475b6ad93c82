package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-contract witness for the e4 banded near-dup face (round 11):
  * at FIXED nBits the in-bucket candidate volume is Σ_b n_b² —
  * quadratic in corpus size (measured 3.7 s → 84 s on the 10× step at
  * the gate's nBits=6). The documented production contract is
  * nBits ∝ log(corpus) so the mean bucket stays O(1); this probe
  * measures the banded face at several nBits on the same corpus to
  * show the knob restores ~linear cost (and reports the candidate
  * count, the actual scale variable).
  *
  * Run: sbt "runMain graft.tools.E4Probe [sfDir] [nBits ...]"
  */
object E4Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale_10x")
    val bits = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(6, 9, 12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    println(s"corpus: $n vectors ($dir)")
    bits.foreach { b =>
      // candidate volume BEFORE the verify filter: the scale variable
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .embeddingNearDupBanded(emb, threshold = 0.4, nBits = b)
        .count()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"nBits=$b%2d  buckets/table=${1 << b}%5d  " +
        f"mean bucket=${n.toDouble / (1 << b)}%8.1f  " +
        f"pairs>=0.4=$pairs%8d  wall=$el%7.2f s")
    }
    spark.stop()
  }
}
