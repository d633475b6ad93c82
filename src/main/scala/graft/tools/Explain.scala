package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("r2_point_get", "q_join_revenue", "q1_agg",
      "g2_two_hop_distinct", "e1_knn_brute", "s1_tumbling") else args.toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
