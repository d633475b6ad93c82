package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, PropertyGraph}

/** Scale decomposition for a_betweenness_est (round 10).
  *
  * The GATE's seed predicate is modulo-based (customers % 101,
  * suppliers % 11), so |S| grows WITH the graph and the sampled
  * Brandes forest does |S|·|V| work — quadratic across replications BY
  * CONSTRUCTION, which the 10× step exposed (9.2 s → ~150 s). The
  * Brandes–Pich estimator's actual contract is a FIXED sample size
  * chosen for a target error, independent of n. This probe measures
  * that contract on the same scale dirs: seed modulus scaled by the
  * replication factor (so |S| stays ≈ the 1× count) while the graph
  * grows 10×/100× — the number a 100 TB deployment would see.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_SEED_SCALE=<r>
  *        runMain graft.tools.BetProbe
  */
object BetProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale_base")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seedScale = sys.env.getOrElse("SPARK_GRAFT_SEED_SCALE", "1").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mask = (1L << PropertyGraph.Shift) - 1
    def lo(l: String) = PropertyGraph.encodeId(l, 0L)
    def hi(l: String) = PropertyGraph.encodeId(l, mask)

    def run(): (Long, Long) = {
      val gr = PropertyGraph.fromTpch(spark, dir)
      val e = gr.edges.filter(col("label") === "part_of" ||
        (col("label") === "located_in" &&
          (col("src").between(lo("supplier"), hi("supplier")) ||
           col("src").between(lo("customer"), hi("customer")))))
      // FIXED-|S| contract: modulus grows with the replication factor,
      // so the seed count matches the 1× gate's
      val seeds = gr.vertices.filter(
          (col("id").between(lo("customer"), hi("customer")) &&
            (col("id") - lo("customer")) % (101L * seedScale) === 0) ||
          (col("id").between(lo("supplier"), hi("supplier")) &&
            (col("id") - lo("supplier")) % (11L * seedScale) === 0) ||
          (col("id").between(lo("nation"), hi("nation")) &&
            (col("id") - lo("nation")) % 2 === 0) ||
          col("id") === PropertyGraph.encodeId("region", 0L))
        .select(col("id"))
      val nSeeds = seeds.count()
      val out = Algorithms.betweenness(spark, PropertyGraph(gr.vertices, e),
          seeds = Some(seeds))
        .filter(col("bc") > 0)
      (nSeeds, out.count())
    }

    run() // warm
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val (ns, rows) = run()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[betprobe] dir=$dir seedScale=$seedScale seeds=$ns rows=$rows time=$el%.2f s")
      el
    }
    println(f"[betprobe] median=${times.sorted.apply(times.length / 2)}%.2f s")
    spark.stop()
  }
}
