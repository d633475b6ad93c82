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
    // Kryo + GraphX registrations — keep the measurement session
    // identical to Bench's (value-neutral, speed-only)
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
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    val warm = sys.env.get("SPARK_GRAFT_WARM")

    // hypervisor-steal bracketing, same ground truth as Bench: a run
    // that lost > 2.5 core-s to the host ran on the hypervisor's
    // clock; its timing is excluded from the reported median whenever
    // any clean run exists (the isolated re-measure exists precisely
    // because steal contaminated the in-bench numbers — an isolated
    // median that silently includes stolen runs re-imports the defect)
    def stealJiffies(): Long =
      try {
        val line = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).getOrElse("")
        val f = line.trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case _: Throwable => 0L }
    val stealMax = 250L

    // SPARK_GRAFT_CANARY=1 brackets the measured set with the same two
    // reference jobs the full bench uses (scan q1_agg + a 5-round
    // nation join/agg loop) so an isolated median can be certified as
    // taken on a window both canaries saw quiet — the round-8 lesson
    // is that steal throttles many-short-stage jobs while scans stay
    // flat, so a lone median with no iterative reference is
    // uninterpretable when it disagrees with history.
    val canary = sys.env.get("SPARK_GRAFT_CANARY").contains("1")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("n_nationkey AS id", "n_regionkey AS r")
    def iterCanaryJob(): Unit = {
      var lbl = nation.selectExpr("id", "id AS lbl")
      (1 to 5).foreach { _ =>
        val regionMin = lbl.join(nation, "id")
          .groupBy("r").agg(org.apache.spark.sql.functions.min("lbl").as("rlbl"))
        lbl = nation.join(regionMin, "r").selectExpr("id", "rlbl AS lbl")
      }
      lbl.write.format("noop").mode("overwrite").save()
    }
    def canaries(tag: String): Unit = if (canary) {
      def t(f: () => Unit): Double = {
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
      }
      val scan = t(() => graft.SparkEntry.queries("q1_agg")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val iter = t(() => iterCanaryJob())
      println(f"[canary/$tag] scan=$scan%.2fs iter=$iter%.2fs")
    }
    if (canary) { iterCanaryJob(); canaries("start") } // warm, then observe

    args.foreach { n =>
      warm.foreach { wd =>
        try graft.SparkEntry.queries(n)(spark, wd)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
      val timed = (1 to runs).map { _ =>
        val s0 = stealJiffies()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val el = (System.nanoTime() - t0) / 1e9
        // duration-scaled threshold for LONG runs (round-10): the
        // absolute 2.5 core-s limit flags every multi-minute scale run
        // by construction (the background steal rate alone crosses it),
        // reducing the flag to noise exactly where a real verdict is
        // wanted. Sub-minute runs keep the strict absolute limit (the
        // r8 evidence: 2.5 core-s concentrated on stage scheduling can
        // triple a short iterative query); beyond 60 s a run is flagged
        // only when steal exceeds 2% of its total core-time — a
        // materiality threshold, not a fixed tax allowance.
        val limit = if (el <= 60.0) stealMax
          else math.max(stealMax, (el * cpus.toInt * 100 * 0.02).toLong)
        (el, stealJiffies() - s0 <= limit)
      }
      val ts = timed.map(_._1)
      val clean = timed.filter(_._2).map(_._1).sorted
      val med = if (clean.nonEmpty) clean(clean.length / 2)
        else ts.sorted.apply(runs / 2)
      val ann = timed.map { case (t, ok) => f"$t%.2f" + (if (ok) "" else "*") }
      println(f"$n%-24s median=$med%7.2fs  clean=${clean.length}/$runs  " +
        s"in-order=${ann.mkString(",")}  (*=steal-contaminated, excluded)")
      canaries(n)
    }
    spark.stop()
  }
}
