package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Physical graph storage layout — the 100 TB design.
  *
  * The reference materializes every edge twice — EDGE_OUT keyed by
  * source vertex, EDGE_IN keyed by target (TikvTables.java:128-143) —
  * so either direction of traversal is a local prefix scan. The
  * Spark-native equivalent of that exact trade is storing the edges
  * table twice, BUCKETED on `src` and on `dst` respectively: a
  * traversal join against the matching copy is then co-partitioned and
  * plans with NO shuffle on the edge side (bucketed scan ↔ the
  * reference's region-local scan). Vertices are partitioned by label,
  * so `hasLabel` prunes whole directories — the VERTEX_LABEL_INDEX
  * analog (TikvStore.java:363-366).
  *
  * Bucket counts size to the cluster: at 100 TB with 1000 executors,
  * O(10k) buckets keep each bucket a few GB; locally the demo uses 8.
  */
object GraphStorage {

  /** Drop a managed table AND its leftover warehouse location (the
    * in-memory catalog forgets tables across JVMs while the warehouse
    * directory persists, which otherwise fails CREATE with
    * LOCATION_ALREADY_EXISTS).
    */
  def dropTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$wh/$name")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** W12 table DDL (TikvStdSessions.java:103-124 parity): the
    * reference's createTable/dropTable/existsTable triple against the
    * session catalog. Spark-first: a managed parquet table registered
    * through the catalog — `exists` asks the catalog, not the
    * filesystem, exactly as the reference asks the store's table
    * registry rather than probing keys.
    */
  def createTable(spark: SparkSession, name: String, data: DataFrame): Unit =
    data.write.mode(SaveMode.ErrorIfExists).format("parquet").saveAsTable(name)

  def existsTable(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Persist the graph: label-partitioned vertices + dual bucketed edge
    * tables (`<prefix>_edges_by_src`, `<prefix>_edges_by_dst`).
    */
  def saveGraph(spark: SparkSession, g: PropertyGraph, prefix: String,
                buckets: Int = 8): Unit = {
    Seq(s"${prefix}_vertices", s"${prefix}_edges_by_src", s"${prefix}_edges_by_dst")
      .foreach(dropTable(spark, _))
    g.vertices.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy("label")
      .saveAsTable(s"${prefix}_vertices")
    g.edges.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "src").sortBy("src", "sort_key")
      .saveAsTable(s"${prefix}_edges_by_src")
    g.edges.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "dst").sortBy("dst")
      .saveAsTable(s"${prefix}_edges_by_dst")
  }

  /** Load the stored graph with BOTH edge clusterings attached:
    * out-traversals join the by_src copy, in-traversals the by_dst
    * copy (PropertyGraph.edgesForDst) — each direction reads
    * co-located buckets with no edge-side shuffle. `forward = false`
    * flips the primary frame for callers that consume `edges`
    * directly in dst order.
    */
  def loadGraph(spark: SparkSession, prefix: String,
                forward: Boolean = true): PropertyGraph = {
    val bySrc = spark.table(s"${prefix}_edges_by_src")
    val byDst = spark.table(s"${prefix}_edges_by_dst")
    PropertyGraph(spark.table(s"${prefix}_vertices"),
      if (forward) bySrc else byDst, edgesByDst = Some(byDst))
  }

  /** Incremental edge ingest: append a batch into BOTH bucketed edge
    * tables without rewriting them. insertInto honors the tables'
    * bucket spec, so each append shuffles only the new batch into its
    * buckets (per-bucket additive files) — the full-table reshuffle
    * happens once at saveGraph, never again. Periodic compaction of
    * small per-append files is ordinary parquet housekeeping.
    */
  def appendEdges(spark: SparkSession, prefix: String, edges: DataFrame): Unit = {
    edges.write.mode(SaveMode.Append).insertInto(s"${prefix}_edges_by_src")
    edges.write.mode(SaveMode.Append).insertInto(s"${prefix}_edges_by_dst")
  }

  /** TTL physical expiry — the reclaim half of W1. The reference hands
    * expiry to the store (TTL on the KV put, TikvTable.java:95-101);
    * the batch analog is a COMPACTION: rewrite the table keeping only
    * rows whose `expire_at` is after `asOf`, so expired data stops
    * occupying storage (TtlFilterRule/liveAsOf only hide it at read).
    * Returns (kept, reclaimed) row counts.
    *
    * The live set is materialized (localCheckpoint) before the
    * overwrite because a table cannot be rewritten while being read;
    * on a real deployment the same operator targets a transactional
    * format (Delta/Iceberg) where the rewrite is a new snapshot and
    * the swap is atomic — the plan shape (one filtered scan, one
    * write, no shuffle) is identical.
    */
  def vacuumExpired(spark: SparkSession, table: String,
                    asOf: org.apache.spark.sql.Column): (Long, Long) = {
    val df = spark.table(table)
    val total = df.count()
    val live = df.filter(col("expire_at") > asOf).localCheckpoint()
    val kept = live.count()
    live.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
    (kept, total - kept)
  }
}
