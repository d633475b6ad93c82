package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "don't rescan 100 TB to
  * absorb today's partition" operator. Spark's partial aggregation is
  * exactly this algebra applied inside one job; here the partial
  * state is materialized as a first-class frame so it can live in a
  * table and absorb delta batches across jobs (the foreachBatch /
  * Lambda-architecture pattern):
  *
  *   state(full) == merge(state(base), state(delta))
  *
  * for any split of the input — because (n, sum, min, max) is an
  * algebraic (commutative-monoid) summary. Merging shuffles only the
  * per-key STATE rows (|keys| cardinality), never the raw data; the
  * delta pass scans the delta alone.
  *
  * Deletions: n/sum retract with negative deltas, but min/max are NOT
  * retractable (dropping the current min needs the runner-up) —
  * absorb deletions by re-aggregating only the affected keys'
  * partitions, or keep a per-key top-k sketch. Documented trade, same
  * as every IVM engine.
  */
object Incremental {

  val StateCols: Seq[String] = Seq("n", "sum_cents", "min_cents", "max_cents")

  /** per-key aggregate state over integer-cents values (exact,
    * engine-portable — graft.util.Exact).
    */
  def aggState(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val cents = graft.util.Exact.cents(value)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"),
        min(cents).as("min_cents"), max(cents).as("max_cents"))
  }

  /** merge any number of state frames: union + re-aggregate with each
    * component's combine function (sum-of-sums, min-of-mins, …).
    */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
  }

  /** render a state frame for reporting: dollars from cents. */
  def report(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("n"),
      (col("sum_cents") / 100.0).as("total"),
      (col("min_cents") / 100.0).as("min_val"),
      (col("max_cents") / 100.0).as("max_val")): _*)
}
