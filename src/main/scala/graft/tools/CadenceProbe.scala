package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM alternating A/B of checkpoint CADENCE in the
  * single-consumer integer-unit loop family (pageRankExact shape, geo
  * subgraph): cadence 2 (the r15 default) vs cadence k (arg 2,
  * default 5) vs full-lazy (roll only the final round). The state is
  * tiny (~16k rows) on the gate subgraph, so this isolates the
  * per-roll FIXED cost (job scheduling + materialization stop) from
  * data volume — the r15 c8-vs-c32 scaling artifact showed these
  * loops are overhead-bound, not data-bound. Alternating runs, min of
  * each side (contention only ever ADDS time).
  */
object CadenceProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val kAlt = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // pageRankExact's exact r16 shape with parameterized cadence
    def pr(cadence: Int): DataFrame = {
      val e0 = g.edges.filter(col("label").isin("located_in", "part_of"))
      val edges = e0.select(col("src"), col("dst"))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edgesDeg = edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
        .repartition(col("src"))
        .persist(MEMORY_AND_DISK)
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .persist(MEMORY_AND_DISK)
      val noIn = verts
        .join(edgesDeg.select(col("dst").as("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(150000L).as("pr"))
        .persist(MEMORY_AND_DISK)
      try {
        val rc = new graft.util.Checkpoints.Rolling
        var pr = rc.roll(verts.select(col("id"), lit(1000000L).as("pr")))
        for (k <- 1 to 10) {
          val contrib = edgesDeg
            .join(pr.select(col("id").as("src"), col("pr"))
              .hint("shuffle_hash"), "src")
            .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
            .groupBy(col("id")).agg(sum(col("c")).as("m"))
          val next = contrib
            .select(col("id"), expr("150000L + (85L * m) div 100L").as("pr"))
            .unionByName(noIn)
          pr = if (k % cadence == 0 || k == 10) rc.roll(next) else next
        }
        pr.orderBy(col("pr").desc, col("id")).limit(10).localCheckpoint(true)
      } finally {
        edgesDeg.unpersist(blocking = false)
        verts.unpersist(blocking = false)
        noIn.unpersist(blocking = false)
      }
    }

    noop(pr(2)); noop(pr(kAlt)) // warm both
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    val c = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime(); noop(pr(2)); a += (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); noop(pr(kAlt)); b += (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); noop(pr(10)); c += (System.nanoTime() - t2) / 1e9
    }
    println(f"cadence2  min=${a.min}%6.2f runs=${a.map(x => f"$x%.2f").mkString(",")}")
    println(f"cadence$kAlt%-2d min=${b.min}%6.2f runs=${b.map(x => f"$x%.2f").mkString(",")}")
    println(f"cadence10 min=${c.min}%6.2f runs=${c.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
