package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, PropertyGraph}

/** Stage decomposition for a_ktruss (round-10 close): the truss graph
  * itself is tiny (3.6k edges, max degree 6 at sf0.1), so a 100 s
  * gate timing must be plan/driver overhead, not wedge volume. This
  * probe times (1) the bipartite projection materialization, (2) the
  * projection pre-materialized into a localCheckpoint then the peel
  * alone, and (3) the full gate path, to pin which stage carries the
  * cost.
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[truss-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val g = PropertyGraph.fromTpch(spark, dir)
    val proj = Algorithms.bipartiteProjection(
      g.edges.filter(col("label") === "contains"), minSupport = 2L)
    time("projection count")(proj.count())
    val mat = time("projection localCheckpoint")(
      proj.localCheckpoint(true))
    time("peel on materialized projection")(
      Algorithms.kTruss(mat, k = 3, rounds = 3).count())
    time("full gate path")(
      Algorithms.kTruss(proj, k = 3, rounds = 3).count())
    spark.stop()
  }
}
