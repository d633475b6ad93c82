package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.4 "salting for skew").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one build-side key dominates so badly
  * that even split partitions overwhelm a task (the classic power-law
  * vertex in a graph workload — a celebrity node's edge list).
  *
  * saltedJoin replicates the RIGHT side `salt` ways and scatters the
  * LEFT side across the replicas: result is identical to a plain inner
  * join (verified in SkewSpec), but the hot key's rows spread over
  * `salt` tasks instead of one.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0)
    val saltCol = "__salt"
    // scatter: each left row picks a deterministic replica
    val saltedLeft = left.withColumn(saltCol,
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    // replicate: right side joins every replica id
    val replicas = explode(array((0 until salt).map(lit): _*)).as(saltCol)
    val saltedRight = right.withColumn(saltCol, replicas)
    saltedLeft.join(saltedRight, Seq(key, saltCol)).drop(saltCol)
  }

  /** key-frequency report — pick salting candidates from the tail. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
