package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the driver's flagship smoke check
  * (SparkEntry.entry rows > 0 on sf0.001).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
