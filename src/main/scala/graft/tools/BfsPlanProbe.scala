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
    // SPARK_GRAFT_STATECARRY=1 mirrors the r16 (id,label) state-carry
    // loop: the per-round state IS the frontier frame — no rehydration
    // semi-join against the vertex cache
    val carry = sys.env.get("SPARK_GRAFT_STATECARRY").contains("1")
    val stateCols =
      if (carry) Seq(col("id"), col("label")) else Seq(col("id"))
    var frontier = gc.vertices
      .filter(col("id") === PropertyGraph.encodeId("region", 0L))
      .select(stateCols: _*).dropDuplicates("id").localCheckpoint()
    var visited = frontier.select(col("id"))
    var depth = 0
    val printAt = args.headOption.map(_.toInt).getOrElse(3)
    while (depth < 6 && !frontier.isEmpty) {
      val frontierV =
        if (carry) frontier
        else gc.vertices.join(frontier, Seq("id"), "left_semi")
      val stepped = Traversal(gc, frontierV, isEdge = false).in()
      val next = stepped.df.select(stateCols: _*).dropDuplicates("id")
        .join(visited, Seq("id"), "left_anti")
      if (depth == printAt) {
        println(s"\n===== round $depth next-state plan (carry=$carry) =====")
        next.explain("formatted")
      }
      val ck = next.localCheckpoint()
      visited = visited.union(ck.select(col("id")))
      frontier = ck
      depth += 1
    }
    spark.stop()
  }
}
