package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every implemented operator group; each key
  * has a matching DuckDB oracle in `oracleSql` unless the operator is
  * not SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.1 slice): BUILDING-segment customers →
    * their orders via the property-graph `placed` edge → count per
    * customer. Exercises label filter, secondary-index predicate, one-hop
    * traversal, and aggregation. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val g = graft.graph.PropertyGraph.fromTpch(spark, "/root/testdata/sf0.001")
    g.V.hasLabel("customer").has("mktsegment", "BUILDING")
      .withPath.out("placed").paths
      .select(element_at(col("path"), 1).as("customer_id"))
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("customer_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.StoreOps.defs ++
      graft.queries.Relational.defs ++
      graft.queries.GraphQueries.defs ++
      graft.queries.AlgoQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.StreamingQueries.defs ++
      graft.queries.WriteQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.StoreOps.oracle ++
      graft.queries.Relational.oracle ++
      graft.queries.GraphQueries.oracle ++
      graft.queries.AlgoQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.StreamingQueries.oracle ++
      graft.queries.WriteQueries.oracle
}
