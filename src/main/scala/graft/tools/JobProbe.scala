package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.concurrent.TrieMap

/** Dev tool: per-JOB time decomposition of one query — which of an
  * iterative query's jobs (round checkpoints, emptiness tests, final
  * materialization) carry the wall-clock. Runs the query once untimed
  * (warm), then once with a listener printing every job's duration and
  * first-stage name. Guide §1: measure before changing.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val kryoConf = new org.apache.spark.SparkConf()
      .set("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    org.apache.spark.graphx.GraphXUtils.registerKryoClasses(kryoConf)
    val spark = SparkSession.builder().config(kryoConf).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = TrieMap.empty[Int, (Long, String)]
    @volatile var rows = List.empty[(Int, Double, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val name = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), name))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.remove(je.jobId).foreach { case (t0, name) =>
          rows synchronized {
            rows = (je.jobId, (System.nanoTime() - t0) / 1e9, name) :: rows
          }
        }
      }
    }

    args.foreach { n =>
      // warm at sf0.001 like the bench, then at the target dir once
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // instrumented run
      rows = Nil
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val rs = rows.sortBy(_._1)
      val jobSum = rs.map(_._2).sum
      println(f"\n===== $n total=$total%.2fs jobs=${rs.size} jobSum=$jobSum%.2fs (gap=${total - jobSum}%.2fs driver/plan) =====")
      rs.foreach { case (id, d, name) =>
        println(f"  job $id%4d  $d%7.3fs  $name")
      }
    }
    spark.stop()
  }
}
