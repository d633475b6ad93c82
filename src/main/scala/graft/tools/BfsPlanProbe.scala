package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: reconstruct repeatUntil's per-round nextIds plan for the
  * g18 shape (region 0, _.in()) and print explain("formatted") for a
  * mid-loop round, so the per-round Exchange/Broadcast count is
  * visible (the loop's plans never surface through the query's own
  * explain — the rounds execute during construction).
  */
object BfsPlanProbe {
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
    import graft.graph.{PropertyGraph, Traversal}
    val g0 = PropertyGraph.fromTpch(spark, dir)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // SPARK_GRAFT_NARROWV=1 mirrors the r15 narrow in-loop vertex cache
    val loopV = if (sys.env.get("SPARK_GRAFT_NARROWV").contains("1"))
      g0.vertices.select(col("id"), col("label"))
        .repartition(col("id")).sortWithinPartitions("id").persist(level)
    else g0.vertices
    val gc = PropertyGraph(loopV, g0.edges.persist(level), g0.edgesByDst)
    var frontierIds = gc.vertices
      .filter(col("id") === PropertyGraph.encodeId("region", 0L))
      .select(col("id")).dropDuplicates("id").localCheckpoint()
    var visited = frontierIds
    var depth = 0
    val printAt = args.headOption.map(_.toInt).getOrElse(3)
    while (depth < 6 && !frontierIds.isEmpty) {
      val frontierV = gc.vertices.join(frontierIds, Seq("id"), "left_semi")
      val stepped = Traversal(gc, frontierV, isEdge = false).in()
      val nextIds = stepped.df.select(col("id")).dropDuplicates("id")
        .join(visited, Seq("id"), "left_anti")
      if (depth == printAt) {
        println(s"\n===== round $depth nextIds plan =====")
        nextIds.explain("formatted")
      }
      val ck = nextIds.localCheckpoint()
      visited = visited.union(ck)
      frontierIds = ck
      depth += 1
    }
    spark.stop()
  }
}
