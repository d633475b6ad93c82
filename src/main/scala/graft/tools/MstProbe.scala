package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnosis artifact for the Borůvka driver hang (round 10): Catalyst
  * STATISTICS INHERITANCE across localCheckpoint squares under
  * self-joins.
  *
  * `Dataset.localCheckpoint` copies the pre-checkpoint plan's
  * `sizeInBytes` estimate — an EXACT BigInt — onto the resulting
  * LogicalRDD (`LogicalRDD.rewriteStatsAndConstraints`). A pointer-jump
  * loop self-joins its own rolled state, so each roll's estimate is the
  * SQUARE of the previous roll's: the BigInt's digit count DOUBLES per
  * jump, compounding across rounds. After ~30 rolls the driver's main
  * thread is pinned inside gigadigit `BigInteger.multiply`
  * (ToomCook/Karatsuba) while ESTIMATING the stats of the next
  * checkpoint — observed as a_mst hanging >20 min at sf0.001 with
  * 1300 core-seconds burnt in `SizeInBytesOnlyStatsPlanVisitor`.
  *
  * The fix (graft.util.Checkpoints.Rolling(resetStats = true)) rebuilds
  * each checkpoint through the public `createDataFrame(chk.rdd, schema)`
  * boundary, dropping the inherited estimate. This probe prints the
  * bit length of `sizeInBytes` and the wall time per jump for both
  * modes on identical 1k-row data — inherited mode's bit length doubles
  * per jump and its per-jump wall time explodes once the BigInt leaves
  * the fast multiply range; reset mode stays flat.
  *
  * Run: sbt "runMain graft.tools.MstProbe [jumps=20]"
  */
object MstProbe {
  def main(args: Array[String]): Unit = {
    val jumps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def chain(label: String, reset: Boolean): Unit = {
      val rc = new graft.util.Checkpoints.Rolling(resetStats = reset)
      var pj = rc.roll(spark.range(1000)
        .select(col("id").as("c"), (col("id") / 2).cast("long").as("p")))
      var blown = false
      for (j <- 1 to jumps if !blown) {
        val t0 = System.nanoTime()
        pj = rc.roll(pj.as("x").join(pj.select(col("c").as("p"),
            col("p").as("pp")).as("y"), "p")
          .select(col("x.c").as("c"), col("pp").as("p")))
        val ms = (System.nanoTime() - t0) / 1e6
        val bits = pj.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
        System.err.println(f"[mst-probe] $label jump $j%2d: " +
          f"sizeInBytes bits=$bits%9d  roll=$ms%9.1f ms")
        // stop the inherited chain before it pins the driver for hours
        if (ms > 30000) { blown = true
          System.err.println(s"[mst-probe] $label: aborting — per-jump " +
            "cost exceeded 30 s (the hang, reproduced)")
        }
      }
      rc.releaseLast()
    }

    chain("reset    ", reset = true)
    chain("inherited", reset = false)
    spark.stop()
  }
}
