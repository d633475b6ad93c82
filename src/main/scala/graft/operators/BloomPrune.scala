package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpr}

/** Bloom-filter join pruning — the scale pattern for "semi-join a huge
  * fact table against a dim-side key set too big to broadcast-hash-join
  * but small enough to sketch". The filter build is a distributed
  * aggregate over the dim side (Spark's own codegen'd
  * BloomFilterAggregate — the engine kernel behind its runtime-filter
  * optimization, driven here explicitly as an operator); only the
  * final ~numBits/8-byte bitmap returns to the driver and ships to
  * probe tasks as a plan literal. The probe is the codegen'd
  * BloomFilterMightContain predicate — no UDF, no per-row JVM boxing.
  *
  * The bloom prune is a superset filter (false positives only, never
  * false negatives), so [[semiJoin]] follows it with the exact
  * semi-join on survivors: the result is EXACT while the expensive
  * shuffle carries only `matches + fpp·nonmatches` fact rows instead
  * of the whole table. At 100 TB that is the difference between
  * shuffling a few hundred GB and shuffling the full fact table.
  */
object BloomPrune {

  /** Distributed bloom build over `key` of `dim` (nulls skipped):
    * returns the serialized filter. Size for the EXPECTED distinct key
    * count; bits/item ≈ numBits/items gives fpp ≈ 0.5^(0.7·bits/item).
    */
  def buildFilter(dim: DataFrame, key: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(toExpr(xxhash64(key)),
      toExpr(lit(expectedItems)), toExpr(lit(numBits)))
      .toAggregateExpression()
    dim.select(toColumn(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Codegen'd probe predicate: true if `key` MIGHT be in the filter
    * (false positives possible, false negatives never).
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    toColumn(BloomFilterMightContain(toExpr(lit(filterBytes)),
      toExpr(xxhash64(key))))

  /** Exact left-semi join of `fact` against `dim`'s key set, bloom
    * pre-pruned: filter first (map-only, kills ~(1−fpp) of the
    * non-matching fact before any exchange), then the exact semi-join
    * on the survivors.
    */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    val bytes = buildFilter(dim, col(dimKey), expectedItems, numBits)
    fact.filter(mightContain(bytes, col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
