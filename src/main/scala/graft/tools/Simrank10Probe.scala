package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 stage decomposition of the CURRENT simRankExact plan (diag
  * split): times graph load, edge prep, the cached diag-half aggregate,
  * each round's off-half expansion, and the finalize — so the residual
  * cost of the a_simrank gate is attributed to stages, not guessed.
  */
object Simrank10Probe {
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

    val g = t("graph load")(graft.graph.PropertyGraph.fromTpch(spark, dir))
    val e0 = g.edges.filter(col("label").isin("placed", "contains"))
    val e = e0.select(col("src"), col("dst")).distinct().persist(MEMORY_AND_DISK)
    println(s"  e rows: ${t("e distinct+count")(e.count())}")
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .persist(MEMORY_AND_DISK)
    println(s"  indeg rows: ${t("indeg")(indeg.count())}")
    val diag = verts.select(col("id").as("i"), col("id").as("j"),
      lit(1000000L).as("s"))
    val eDeg = e.join(indeg, "dst")
      .select(col("src"), col("dst"), col("d")).persist(MEMORY_AND_DISK)
    println(s"  eDeg rows: ${t("eDeg")(eDeg.count())}")
    val eNS = eDeg.join(
        e.select(col("src").as("dst")).distinct(), Seq("dst"), "left_semi")
      .persist(MEMORY_AND_DISK)
    println(s"  eNS rows: ${t("eNonSinkDeg")(eNS.count())}")

    def expandAgg(pairs: org.apache.spark.sql.DataFrame,
                  eR: org.apache.spark.sql.DataFrame) = pairs
      .join(eR.select(col("src").as("i"), col("dst").as("a"),
        col("d").as("da")), "i")
      .join(eR.select(col("src").as("j"), col("dst").as("b"),
        col("d").as("db")), "j")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("da"), col("db"))
      .agg(sum(col("s")).as("m"))
    def roundScores(mp: org.apache.spark.sql.DataFrame) = mp
      .groupBy(col("a"), col("b"), col("da"), col("db"))
      .agg(sum(col("m")).as("m"))
      .select(col("a").as("i"), col("b").as("j"),
        expr("(4L * m) div (5L * da * db)").as("s"))
      .filter(col("s") > 0)

    val mDiagNS = expandAgg(diag, eNS).persist(MEMORY_AND_DISK)
    println(s"  mDiagNS rows: ${t("mDiagNS agg")(mDiagNS.count())}")
    var symOff = diag.limit(0)
    var lastOff = diag.limit(0)
    for (k <- 1 to 3) {
      println(s"round $k:")
      val offC =
        if (k < 3) roundScores(mDiagNS.unionByName(expandAgg(symOff, eNS)))
        else roundScores(expandAgg(diag, eDeg)
          .unionByName(expandAgg(symOff, eDeg)))
      lastOff = offC
      if (k < 3) {
        val chk = t(s"r$k checkpoint")(offC.localCheckpoint())
        println(s"  off rows: ${t(s"r$k count")(chk.count())}")
        symOff = chk.select(explode(array(
            struct(col("i"), col("j"), col("s")),
            struct(col("j").as("i"), col("i").as("j"), col("s")))).as("p"))
          .select(col("p.i").as("i"), col("p.j").as("j"), col("p.s").as("s"))
      }
    }
    val part = graft.graph.PropertyGraph.LabelCodes("part")
    val shift = 1L << graft.graph.PropertyGraph.Shift
    val fin = lastOff
      .filter(expr(s"i div $shift = $part") && expr(s"j div $shift = $part"))
      .orderBy(col("s").desc, col("i"), col("j")).limit(20)
    println(s"  final rows: ${t("final round + top-20")(fin.collect().length)}")
    // VARIANT: does Catalyst push the part-part finalize filter below
    // the final expansion join? If this explicit pre-filter of the
    // edge frame is much faster, it does not.
    val ePart = eDeg.filter(expr(s"dst div $shift = $part"))
      .persist(MEMORY_AND_DISK)
    println(s"  ePart rows: ${t("ePart")(ePart.count())}")
    val finB = roundScores(expandAgg(diag, ePart)
        .unionByName(expandAgg(symOff, ePart)))
      .orderBy(col("s").desc, col("i"), col("j")).limit(20)
    println(s"  final rows B: ${t("final PREFILTERED + top-20")(finB.collect().length)}")
    println("  plans equal output: " +
      fin.collect().toSeq.equals(finB.collect().toSeq))
    // VARIANT C: broadcast the edge frame in both expansion joins —
    // the stream side (state expansions) never shuffles; only the
    // final groupBy exchange remains.
    def expandAggB(pairs: org.apache.spark.sql.DataFrame,
                   eR: org.apache.spark.sql.DataFrame) = pairs
      .join(broadcast(eR.select(col("src").as("i"), col("dst").as("a"),
        col("d").as("da"))), "i")
      .join(broadcast(eR.select(col("src").as("j"), col("dst").as("b"),
        col("d").as("db"))), "j")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("da"), col("db"))
      .agg(sum(col("s")).as("m"))
    val finC = roundScores(expandAggB(diag, eDeg)
        .unionByName(expandAggB(symOff, eDeg)))
      .filter(expr(s"i div $shift = $part") && expr(s"j div $shift = $part"))
      .orderBy(col("s").desc, col("i"), col("j")).limit(20)
    println(s"  final rows C: ${t("final BROADCAST + top-20")(finC.collect().length)}")
    println("  broadcast plan equal output: " +
      fin.collect().toSeq.equals(finC.collect().toSeq))
    spark.stop()
  }
}
