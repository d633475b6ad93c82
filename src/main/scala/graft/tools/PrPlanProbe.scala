package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: reconstruct ONE pageRank round's contrib plan with the
  * r15 edge cache (no repartition, no hint) vs the r16 cache
  * (repartition(src) + shuffle_hash on the state side), so the
  * per-round Exchange/Sort delta is visible — the loop's plans never
  * surface through the query's own explain (rounds execute during
  * construction, and the returned frame is checkpoint-rooted).
  * Arg: "old" | "new" (default new).
  */
object PrPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = graft.graph.PropertyGraph.fromTpch(spark, dir)
    val newShape = !args.headOption.contains("old")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = g.edges.select(col("src"), col("dst"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg0 = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
    val edgesDeg = (if (newShape) edgesDeg0.repartition(col("src"))
                    else edgesDeg0).persist(level)
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    // one materialized state frame, exactly like a mid-loop round
    val pr = verts.select(col("id"), lit(1000000L).as("pr")).localCheckpoint()
    val prSide0 = pr.select(col("id").as("src"), col("pr"))
    val prSide = if (newShape) prSide0.hint("shuffle_hash") else prSide0
    val contrib = edgesDeg
      .join(prSide, "src")
      .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
      .groupBy(col("id")).agg(sum(col("c")).as("m"))
    // materialize the cache first so the round plan reads InMemoryTableScan
    edgesDeg.count()
    println(s"\n===== pageRank round contrib plan (${if (newShape) "NEW r16" else "OLD r15"}) =====")
    contrib.explain("formatted")
    spark.stop()
  }
}
