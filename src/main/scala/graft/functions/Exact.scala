package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numeric helpers.
  *
  * Problem: `sum(double)` depends on summation order, which differs between
  * Spark (partial aggregation over 32 partitions) and the DuckDB oracle, so a
  * value-hash compare on raw double aggregates is flaky. Doubles represent
  * integers exactly up to 2^53, and IEEE addition of exact integers is exact,
  * so integer-valued double sums are order-independent. All money columns in
  * the synthetic tables carry exactly 2 decimals; `cents` lifts them to exact
  * integer space, and a single final division (an exact unary IEEE op on an
  * exact integer) lands on a bit-identical double in both engines.
  */
object Exact {

  /** 2-decimal double -> exact integer-valued double (e.g. 12.34 -> 1234.0). */
  def cents(c: Column): Column = round(c * 100)

  /** Exact revenue sum: sum(price_cents * (100 - discount_pct)) / 10^4.
    * `discount` is a 2-decimal fraction (0.07), so cents(discount) is the
    * integer percentage (7).
    */
  def revenueSum(price: Column, discount: Column): Column =
    sum(cents(price) * (lit(100) - cents(discount))) / 10000.0

  /** Exact sum of a 2-decimal money column. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact average of an integer-valued double column (single division). */
  def exactAvg(c: Column): Column = sum(c) / count(lit(1))
}
