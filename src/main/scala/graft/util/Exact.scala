package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * The correctness gate hash-compares our results against DuckDB.
  * Floating-point SUM is order-dependent, and Spark and DuckDB
  * accumulate in different orders, so a raw `sum(double)` over money
  * columns can differ in the low bits and flip a rounded digit.
  *
  * Pattern used throughout: convert money to integer cents PER ROW
  * (each per-row double op is IEEE-deterministic and identical in both
  * engines), aggregate exactly as BIGINT, and derive any final double
  * via a single division of identical integers — bit-identical across
  * engines. Quantity-like columns hold integral doubles, so their
  * double SUM is already exact (< 2^53).
  */
object Exact {
  /** Money double → exact integer cents (per-row, deterministic).
    *
    * Implemented as signum·floor(abs+0.5) — round-half-away-from-zero
    * in three codegen'd arithmetic ops — rather than Spark's round():
    * Round's DoubleType codegen allocates a java.math.BigDecimal per
    * row (BigDecimal.valueOf → setScale(HALF_UP)), which measured
    * ~55 s of a 84 s aggregate over the 270M-row 10× band join
    * (SCALE.md round-9) — the hot money kernel must not allocate.
    * Identical to HALF_UP for every value that is not an exact .5
    * tie in binary; 2-decimal money × 100 lands within ±ε of
    * integers, far from ties, and the DuckDB fragment below applies
    * the same formula so both engines agree bit-for-bit either way.
    */
  def cents(c: Column): Column = {
    val scaled = c * 100
    (signum(scaled) * floor(abs(scaled) + 0.5)).cast("long")
  }

  /** Exact money sum as a dollars double: SUM(cents)/100.0. */
  def sumDollars(c: Column): Column = (sum(cents(c)) / 100.0)

  /** SQL fragment mirroring [[cents]] for the DuckDB oracle. */
  def sqlCents(expr: String): String =
    s"CAST(SIGN(($expr)*100)*FLOOR(ABS(($expr)*100)+0.5) AS BIGINT)"

  /** SQL fragment mirroring [[sumDollars]]. */
  def sqlSumDollars(expr: String): String = s"SUM(${sqlCents(expr)})/100.0"
}
