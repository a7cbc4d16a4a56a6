package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-determinism helpers (SURVEY.md §5.3).
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` text on the same tables. Doubles summed in different orders,
  * nulls, raw timestamps, and unordered rows all break that compare, so:
  *
  *  - `dsum`: sum via an exact DECIMAL(18,2) cast (inputs are 2-decimal
  *    monetary doubles — FIXTURES.md §A), then back to double. Exact in both
  *    engines regardless of summation order.
  *  - `r4`: round half-up to 4 places; only applied where the true value has
  *    ≤4 decimal digits (e.g. products of two 2-decimal values), where both
  *    engines' rounding agrees bit-for-bit.
  *  - `tstr`: timestamps leave the engine as microsecond strings — sidesteps
  *    INT96/µs/ns parquet representation mismatches between writers.
  */
object Det {
  /** Order-independent exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a 4-decimal product (e.g. price * (1 - discount)). */
  def dsum4(c: Column): Column =
    sum(c.cast(DecimalType(22, 4))).cast("double")

  def r4(c: Column): Column = round(c, 4)

  /** Microsecond-precision timestamp string, matching DuckDB
    * `strftime(ts, '%Y-%m-%d %H:%M:%S.%f')`. */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Day string, matching DuckDB `strftime(ts, '%Y-%m-%d')`. */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
