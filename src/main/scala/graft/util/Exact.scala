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
  /** Money double → exact integer cents (per-row, deterministic). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact money sum as a dollars double: SUM(cents)/100.0. */
  def sumDollars(c: Column): Column = (sum(cents(c)) / 100.0)

  /** SQL fragment mirroring [[cents]] for the DuckDB oracle. */
  def sqlCents(expr: String): String = s"CAST(ROUND(($expr)*100) AS BIGINT)"

  /** SQL fragment mirroring [[sumDollars]]. */
  def sqlSumDollars(expr: String): String = s"SUM(${sqlCents(expr)})/100.0"
}
