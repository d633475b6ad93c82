package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Columnar Parquet + vectorized reader replaces the reference's
  * row-oriented KV layout (TikvStdSessions.java:471-486): predicate
  * pushdown + row-group min/max stats play the role of the reference's
  * ten index tables (TikvStore.java:361-380).
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val pipeline: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = relational ++ pipeline

  /** Plain columnar scan — the analog of the reference's full-table
    * prefix scan (TikvTable.java:191-200), but with column pruning and
    * filter pushdown for free.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events table carries TIMESTAMP(NANOS) parquet timestamps,
    * which Spark has no native type for. With
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    * builder here) the column arrives as LongType nanos; convert to a
    * microsecond TimestampType via integer division (a double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      // the sf0.001 file carries isAdjustedToUTC=false so Spark reads
      // TIMESTAMP_NTZ, which unix_micros/window reject; the session TZ
      // is pinned to UTC, so the cast is a pure type relabel
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
