package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-determinism helpers.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * (Verify.scala → CORRECTNESS_r{N}.json). Double-precision SUM/AVG is
  * order-dependent, and both engines aggregate partitions in nondeterministic
  * order — so every aggregated metric is computed in exact DECIMAL arithmetic
  * (order-independent) and only cast back to DOUBLE for the final output
  * column. The input doubles in the fixtures are "nice" 2-dp values
  * (quantities, prices, discounts), so the double→decimal cast itself is
  * unambiguous in both engines.
  *
  * At scale this is also the *correct* choice for money columns: a 100 TB
  * fact table summed in binary doubles drifts; decimal sums do not.
  */
object Decimals {
  /** Money-ish column (price, balance, value): DECIMAL(12,2). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Quantity column: DECIMAL(12,2). */
  def qty(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rate/discount/tax column: DECIMAL(4,2). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact decimal sum, emitted as double. */
  def dsum(c: Column): Column = sum(c).cast("double")
  /** Order-independent average: exact decimal sum / count, divided in
    * double space (identical IEEE division in both engines). */
  def davg(c: Column): Column = sum(c).cast("double") / count(lit(1))
}
