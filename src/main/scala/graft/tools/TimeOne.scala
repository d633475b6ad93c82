package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries (median of SPARK_GRAFT_RUNS, default
  * 3) on SPARK_GRAFT_SF_DIR without running the whole bench.
  *
  * SPARK_GRAFT_WARM=<dir> runs each query once on <dir> (untimed)
  * first — the Bench warmup protocol, so cold-JIT spikes don't land in
  * run 1. SPARK_GRAFT_CONF="k=v;k=v" sets extra session confs for
  * plan-shape experiments.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val warm = sys.env.get("SPARK_GRAFT_WARM")
    args.foreach { n =>
      warm.foreach { wd =>
        try graft.SparkEntry.queries(n)(spark, wd)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = ts.sorted
      println(f"$n%-24s median=${sorted(runs / 2)}%7.2fs  in-order=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
