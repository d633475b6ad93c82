package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the SIZED SimHash banding (round-13 lead item):
  *
  *  1. invariance — d37 (subset=2) must emit the identical pair set as
  *     d27 (subset=1) at the probe SF (the pigeonhole losslessness the
  *     gate oracle relies on);
  *  2. decade rows — wall-clock for subset=1 vs subset=2 at each
  *     SPARK_GRAFT_SF_DIRS entry (comma-separated; default all three
  *     test SFs), printed as SCALE.md-ready lines.
  *
  * Run: sbt "runMain graft.tools.SimhashProbe"
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val eqDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val d27 = graft.queries.PipelineQueries.d27SimhashPairs(spark, eqDir)
      .collect().toSet
    val d37 = graft.queries.PipelineQueries.d37SimhashSized(spark, eqDir)
      .collect().toSet
    println(s"[simhash] $eqDir invariance: d27=${d27.size} d37=${d37.size} " +
      s"equal=${d27 == d37}")

    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(',').toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    def time(dir: String, m: Int, n: Int): (Double, Long) = {
      var rows = 0L
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        rows = graft.operators.Dedup.simhashNearDup(
            graft.Tables.documents(spark, dir), maxHamming = 3,
            tokenHash = graft.operators.Dedup.portableTokenHash, subset = m)
          .count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(ts.length / 2), rows)
    }
    dirs.foreach { d =>
      Seq(1, 2).foreach(m => time(d, m, 1)) // warm each plan once
      Seq(1, 2).foreach { m =>
        val (sec, rows) = time(d, m, runs)
        println(f"[simhash] $d subset=$m pairs=$rows median=$sec%.2f s")
      }
    }
    spark.stop()
  }
}
