package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_range_join's cost on SPARK_GRAFT_SF_DIR —
  * interval explode, band-join row production, residual filter, and
  * the trailing per-interval aggregate — to tell output-volume cost
  * from plan pathology at the 10× scale step.
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale_10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k.trim, v.trim)
      })

    val w = sys.env.getOrElse("PROBE_W", "4.0").toDouble
    val intervals = graft.Tables.part(spark, dir).select(
      col("p_partkey").as("interval_id"),
      ((col("p_partkey") * 7) % 480).cast("double").as("lo"),
      ((col("p_partkey") * 7) % 480 + 1 + col("p_partkey") % 13)
        .cast("double").as("hi"))
    val points = graft.Tables.events(spark, dir).select(col("value"))

    def time(name: String)(f: () => Long): Unit = {
      f() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"$name%-26s median=$med%7.2fs n=${ts.head._2}  runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    val ivb = intervals.filter(col("hi") >= col("lo"))
      .withColumn("__bucket", explode(sequence(
        floor(col("lo") / w).cast("long"), floor(col("hi") / w).cast("long"))))
    val ptb = points
      .withColumn("__bucket", floor(col("value") / w).cast("long"))

    time("explode intervals")(() => ivb.count())
    time("join+residual count")(() =>
      ptb.join(ivb, Seq("__bucket"))
        .filter(col("value") >= col("lo") && col("value") <= col("hi"))
        .count())
    time("join no-residual count")(() =>
      ptb.join(ivb, Seq("__bucket")).count())
    val joined = ptb.join(ivb, Seq("__bucket"))
      .filter(col("value") >= col("lo") && col("value") <= col("hi"))
    time("agg count-only")(() => {
      joined.groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"))
        .write.format("noop").mode("overwrite").save()
      1L
    })
    time("agg count+sum(double)")(() => {
      joined.groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"), sum(col("value")).as("s"))
        .write.format("noop").mode("overwrite").save()
      1L
    })
    time("agg count+sum(cents)")(() => {
      joined.groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"),
          (sum(graft.util.Exact.cents(col("value"))) / 100.0).as("s"))
        .write.format("noop").mode("overwrite").save()
      1L
    })
    time("full gate agg")(() => {
      graft.queries.Relational.qRangeJoin(spark, dir).write
        .format("noop").mode("overwrite").save()
      1L
    })
    spark.stop()
  }
}
