package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-cost decomposition of simRankExact at
  * SPARK_GRAFT_SF_DIR — per-round state/contrib volumes and wall
  * times, to locate the dominant term before optimizing (the d5
  * MinhashProbe lesson: measure, don't guess).
  */
object SimrankProbe {
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
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)
    val e0 = g.edges.filter(col("label").isin("placed", "contains"))
    val e = e0.select(col("src"), col("dst")).distinct().persist(MEMORY_AND_DISK)
    println(s"edges: ${t("e distinct+count")(e.count())}")
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .persist(MEMORY_AND_DISK)
    println(s"indeg rows: ${t("indeg")(indeg.count())}")
    val diag = verts.select(col("id").as("i"), col("id").as("j"),
      lit(1000000L).as("s"))
    val eNonSink = e.join(
        e.select(col("src").as("dst")).distinct(), Seq("dst"), "left_semi")
      .persist(MEMORY_AND_DISK)
    println(s"eNonSink: ${t("eNonSink")(eNonSink.count())}")
    var state = t("diag checkpoint")(diag.localCheckpoint())
    for (k <- 1 to 3) {
      println(s"round $k:")
      val eRound = if (k < 3) eNonSink else e
      val expanded = state
        .join(eRound.select(col("src").as("i"), col("dst").as("a")), "i")
        .join(eRound.select(col("src").as("j"), col("dst").as("b")), "j")
        .filter(col("a") =!= col("b"))
      println(s"  expanded rows: ${t("expand count")(expanded.count())}")
      val contrib = expanded.groupBy(col("a"), col("b"))
        .agg(sum(col("s")).as("m"))
      val off = contrib
        .join(indeg.select(col("dst").as("a"), col("d").as("da")), "a")
        .join(indeg.select(col("dst").as("b"), col("d").as("db")), "b")
        .select(col("a").as("i"), col("b").as("j"),
          expr("(4L * m) div (5L * da * db)").as("s"))
        .filter(col("s") > 0)
      state = t("agg+deg+checkpoint")(
        diag.unionByName(off).localCheckpoint())
      println(s"  state rows: ${t("state count")(state.count())}")
    }
    spark.stop()
  }
}
