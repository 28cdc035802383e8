package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, when}

/** Decimal rounding that matches how ns-precision engines (DuckDB,
  * Postgres) round raw doubles: floor(x*10^n + 0.5)/10^n on the IEEE
  * value. Spark's built-in round() goes through BigDecimal.valueOf
  * (shortest decimal string), which disagrees exactly at half-way
  * representations (e.g. 0.53575 → 0.5358 vs 0.5357).
  */
object Num {
  // Half-away-from-zero (DuckDB round() on DOUBLE): mirror the positive
  // branch for negatives so exact half-way values agree with the oracle.
  private def r(c: Column, f: Double): Column =
    when(c < 0, -(floor(-c * f + 0.5d) / f)).otherwise(floor(c * f + 0.5d) / f)
  def r4(c: Column): Column = r(c, 10000d)
  def r2(c: Column): Column = r(c, 100d)
}
