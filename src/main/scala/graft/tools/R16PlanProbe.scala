package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: before/after physical plans for the r16 wave-1/4
  * loop-internal changes (round plans never surface in the final
  * frame's explain — rounds execute during construction):
  *   lpaold/lpanew — one LPA round's pick plan (two-exchange agg pair
  *                   vs explicit repartition(v) + two local aggs)
  *   srold/srnew   — the simrank final-round Σ plan (shuffle joins of
  *                   the pair stream vs broadcast edge frame)
  */
object R16PlanProbe {
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
    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)
    val which = args.headOption.getOrElse("lpanew")

    if (which.startsWith("lpa")) {
      val und = g.edges.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val adj = und.select(explode(array(
          struct(col("a").as("v"), col("b").as("n")),
          struct(col("b").as("v"), col("a").as("n")))).as("e"))
        .select(col("e.v").as("v"), col("e.n").as("n"))
        .repartition(col("n")).persist(MEMORY_AND_DISK)
      adj.count()
      val lab = g.vertices.select(col("id"), col("id").as("lbl"))
        .localCheckpoint()
      val nb = adj.join(
        lab.select(col("id").as("n"), col("lbl")).hint("shuffle_hash"), "n")
      val base = if (which == "lpanew")
        nb.select(col("v"), col("lbl")).repartition(col("v"))
      else nb
      val pick = base
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v").as("id"), (-col("m.nl")).as("new_lbl"))
      println(s"\n===== LPA round pick plan ($which) =====")
      pick.explain("formatted")
    } else {
      val e = g.edges.select(col("src"), col("dst")).distinct()
        .persist(MEMORY_AND_DISK)
      val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
      val eDeg = e.join(indeg, "dst")
        .select(col("src"), col("dst"), col("d")).persist(MEMORY_AND_DISK)
      eDeg.count()
      val verts = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val diag = verts.select(col("id").as("i"), col("id").as("j"),
        lit(1000000L).as("s")).localCheckpoint()
      val bc = which == "srnew"
      def side(c1: String, c2: String, c3: String): DataFrame = {
        val f = eDeg.select(col("src").as(c1), col("dst").as(c2),
          col("d").as(c3))
        if (bc) broadcast(f) else f
      }
      val m = diag
        .join(side("i", "a", "da"), "i")
        .join(side("j", "b", "db"), "j")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b"), col("da"), col("db"))
        .agg(sum(col("s")).as("m"))
      println(s"\n===== simrank final-round Σ plan ($which) =====")
      m.explain("formatted")
    }
    spark.stop()
  }
}
