package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures trainCentroids SEEDING cost (iters = 0: seeds only) at a
  * given k over SPARK_GRAFT_SF_DIR's embeddings — the round-12 probe
  * behind SCALE.md's k-means‖ row. The old seeding ran one full-corpus
  * argmin scan PER SEED (k passes); the k-means‖-shaped replacement
  * runs two passes total (min-hash seed + stratified oversample) and
  * reduces the ≤4096-row pool on the driver, so seed wall-clock should
  * be ~flat in k and ~linear in corpus — this probe prints both axes.
  */
object SeedProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale_base")
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32, 64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    emb.count() // warm the scan
    ks.foreach { k =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = graft.operators.Similarity.trainCentroids(
          emb, nCentroids = k, iters = 0)
        val el = (System.nanoTime() - t0) / 1e9
        require(c.length == k)
        el
      }.sorted
      println(f"SEED dir=$dir k=$k median=${runs(1)}%.2f s runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
