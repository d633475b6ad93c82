package graft.tools
object CountTool {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} rowsOnly=${(q -- o).toSeq.sorted.mkString(",")} orphanOracles=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
