package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, PropertyGraph}

/** Stage decomposition for a_scan (round-10 continuation): at the 10×
  * decade the gate read ~45-84 s against an expected ~15 s from the
  * a_ktruss analogy (shared projection + one support pass) — this
  * probe times (1) projection materialization, (2) the σ pass
  * (support + deg joins + the similar-edge checkpoint), (3) the role
  * pipeline after a pre-materialized sim frame, and (4) the full
  * scanCluster, to pin which stage breaks the analogy.
  */
object ScanProbe {
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
      System.err.println(f"[scan-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val g = PropertyGraph.fromTpch(spark, dir)
    val proj = Algorithms.bipartiteProjection(
      g.edges.filter(col("label") === "contains"), minSupport = 2L)
      .select(col("item_a").as("a"), col("item_b").as("b"))
    val mat = time("projection localCheckpoint")(proj.localCheckpoint(true))
    // sigma pass in isolation: the scanCluster prefix up to `sim`
    val e = mat
    def sym(p: org.apache.spark.sql.DataFrame, x: String, y: String) =
      p.select(explode(array(
          struct(col(x).as("u"), col(y).as("v")),
          struct(col(y).as("u"), col(x).as("v")))).as("s"))
        .select(col("s.u").as("u"), col("s.v").as("v"))
    val adj = time("adj localCheckpoint")(sym(e, "a", "b").localCheckpoint(true))
    val deg = adj.groupBy(col("u")).agg((count(lit(1)) + 1).as("d"))
    val cmnInner = e.join(adj.as("n1"), col("a") === col("n1.u"))
      .join(adj.as("n2"),
        col("b") === col("n2.u") && col("n1.v") === col("n2.v"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c0"))
    val cmn = e.join(cmnInner, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("c0"), lit(0L)).as("c"))
    val sim = cmn
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .filter(lit(25L) * (col("c") + 2) * (col("c") + 2)
        >= lit(9L) * col("da") * col("db"))
      .select(col("a"), col("b"))
    val simMat = time("sigma pass (support + deg joins)")(
      sim.localCheckpoint(true))
    System.err.println(s"[scan-probe] |e|=${e.count()} |sim|=${simMat.count()}")
    time("full scanCluster on materialized projection")(
      Algorithms.scanCluster(mat, epsNum = 3, epsDen = 5, mu = 3).count())
    time("full gate path")(
      Algorithms.scanCluster(proj, epsNum = 3, epsDen = 5, mu = 3).count())
    // same-JVM apples-to-apples: the a_ktruss gate path shares the
    // projection, so its time here separates machine weather from a
    // real a_scan-specific cost
    time("ktruss full gate path (same JVM)")(
      Algorithms.kTruss(Algorithms.bipartiteProjection(
          g.edges.filter(col("label") === "contains"), minSupport = 2L),
        k = 3, rounds = 6).count())
    time("projection localCheckpoint (warm, 2nd)")(
      proj.localCheckpoint(true))
    spark.stop()
  }
}
