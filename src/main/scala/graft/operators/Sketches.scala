package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency sketching — bounded-memory heavy hitters. The exact
  * per-key aggregate is one hash shuffle whose state grows with key
  * cardinality; a count-min sketch is a FIXED-size (w·d counters)
  * summary built with Spark's codegen'd `count_min_sketch` aggregate
  * (map-side partials merge associatively), so frequency questions
  * over a 10⁹-key 100 TB column cost megabytes of state instead of a
  * full-cardinality shuffle. Overestimate-only error: est ∈
  * [true, true + eps·N] with probability ≥ confidence.
  */
object Sketches {

  /** Exact top-k keys by frequency, cross-checked against a count-min
    * sketch built in the same pass: (key, n_exact, cms_ok) where
    * cms_ok pins the sketch's one-sided error bound. The top-k list
    * (k rows) is the only driver-side data besides the sketch itself.
    * Deterministic: fixed seed, total (n desc, key) order.
    *
    * Key-type generic over what `count_min_sketch` itself accepts
    * (integral types, string, binary): rows are read untyped and the
    * estimate lookup dispatches on the runtime value; the column name
    * is backtick-quoted so non-identifier names survive the expr().
    */
  def heavyHitters(df: DataFrame, key: String, k: Int = 10,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val quoted = "`" + key.replace("`", "``") + "`"
    val total = df.count()
    val bytes = df
      .select(expr(s"count_min_sketch($quoted, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val top = df.groupBy(col(key)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(key)).limit(k)
      .collect()
    val bound = (eps * total).ceil.toLong
    val rows = top.toSeq.map { r =>
      val kv = r.get(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(kv)
      org.apache.spark.sql.Row(kv, n, est >= n && est <= n + bound)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(key).copy(name = key),
      org.apache.spark.sql.types.StructField("n_exact",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cms_ok",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
