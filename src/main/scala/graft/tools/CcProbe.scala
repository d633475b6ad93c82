package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-round delta sizes + wall times of the delta-frontier
  * CC loop on SPARK_GRAFT_SF_DIR — tells us whether rounds or per-round
  * constants dominate a_cc_alt.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
    sys.env.get("PROBE_PARTS").foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)

    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val adj = g.edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .select(explode(array(
          struct(col("src").as("v"), col("dst").as("n")),
          struct(col("dst").as("v"), col("src").as("n")))).as("e"))
        .select(col("e.v").as("v"), col("e.n").as("n"))
        .repartition(col("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nAdj = adj.count()
      val tAdj = (System.nanoTime() - t0) / 1e9
      var lab = g.vertices.select(col("id")).distinct()
        .select(col("id"), col("id").as("comp")).localCheckpoint()
      println(f"rep $rep setup: adj=$tAdj%.2fs (n=$nAdj) verts=${(System.nanoTime() - t0) / 1e9 - tAdj}%.2fs")
      val first = lab.join(
          adj.groupBy(col("v")).agg(min(col("n")).as("cand"))
            .select(col("v").as("id"), col("cand")).hint("shuffle_hash"),
          Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"),
          (coalesce(col("cand"), col("comp")) < col("comp")).as("__chg"))
        .localCheckpoint()
      var delta = first.filter(col("__chg")).select(col("id"), col("comp"))
      lab = first.select(col("id"), col("comp"))
      println(f"round  1 (agg): ${(System.nanoTime() - t0) / 1e9 - tAdj}%.2fs")
      var it = 1
      var empty = delta.isEmpty
      while (it < 50 && !empty) {
        it += 1
        val r0 = System.nanoTime()
        val merged = graft.graph.Algorithms.ccAltRound(adj, lab, delta)
          .localCheckpoint()
        delta = merged.filter(col("__chg")).select(col("id"), col("comp"))
        lab = merged.select(col("id"), col("comp"))
        empty = delta.isEmpty
        println(f"round $it%2d: ${(System.nanoTime() - r0) / 1e9}%.2fs")
      }
      println(f"rep $rep total: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      adj.unpersist(blocking = false)
    }
    spark.stop()
  }
}
