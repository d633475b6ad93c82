package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev probe: where does e8_pq_topk spend its time — codebook encode,
  * LUT build, the ADC crossJoin scan, or the rerank windows? The gate
  * problem is tiny (2000 vectors × 20 queries at sf0.1), so anything
  * over ~1 s signals an interpreted expression, not data volume.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale_base")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    def time(name: String)(f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-24s median=${ts(1)}%6.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val cb = Similarity.pqCodebook(emb, 8, 8, 16)
    time("encode(codes)")(() =>
      Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        "embedding", cb, 8))
    // LUT projection alone (the 128-cell array over 20 query rows)
    val lutCells = (0 until 8).flatMap { m =>
      cb(m).map { cv =>
        val cvLit = array(cv.map(x => lit(x)): _*)
        floor(graft.functions.VectorFunctions.vec_dot(
          slice(col("query_vec"), m * 8 + 1, 8), cvLit) * 1000000d + 0.5d)
          .cast("long")
      }
    }
    time("lut(20 rows)")(() =>
      queries.select(col("query_id"), array(lutCells: _*).as("lut")))
    // the deliberately-UNBARRIERED variant re-runs the encode nq× —
    // fine at sf0.1 probe scale, hours at 100×; skippable
    if (sys.env.get("SPARK_GRAFT_SKIP_SLOW").isEmpty) time("adc join")(() => {
      val codes = Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        "embedding", cb, 8)
        .select(col("vec_id") +: (0 until 8).map(m => col(s"c$m")): _*)
      val qs = queries.select(col("query_id"), array(lutCells: _*).as("lut"))
      codes.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("approx", (0 until 8)
          .map(m => element_at(col("lut"), (col(s"c$m") + lit(m * 16 + 1)).cast("int")))
          .reduce(_ + _))
        .select(col("query_id"), col("vec_id"), col("approx"))
    })
    time("adc join (repart)")(() => {
      val codes = Similarity.pqEncode(emb.select(col("vec_id"), col("embedding")),
        "embedding", cb, 8)
        .select(col("vec_id") +: (0 until 8).map(m => col(s"c$m")): _*)
        .repartition(col("vec_id"))
      val qs = queries.select(col("query_id"), array(lutCells: _*).as("lut"))
      codes.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("approx", (0 until 8)
          .map(m => element_at(col("lut"), (col(s"c$m") + lit(m * 16 + 1)).cast("int")))
          .reduce(_ + _))
        .select(col("query_id"), col("vec_id"), col("approx"))
    })
    time("full e8")(() => Similarity.pqTopKSeeded(queries, emb, 3))
    // planning vs execution: same DataFrame instance re-executed —
    // Spark caches the QueryExecution, so run 2+ skips analysis/codegen
    val fixed = Similarity.pqTopKSeeded(queries, emb, 3)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fixed.write.format("noop").mode("overwrite").save()
      println(f"same-instance run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
