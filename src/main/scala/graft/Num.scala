package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Decimal rounding that matches how ns-precision engines (DuckDB,
  * Postgres) round raw doubles: floor(x*10^n + 0.5)/10^n on the IEEE
  * value. Spark's built-in round() goes through BigDecimal.valueOf
  * (shortest decimal string), which disagrees exactly at half-way
  * representations (e.g. 0.53575 → 0.5358 vs 0.5357).
  */
object Num {
  def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d
  def r2(c: Column): Column = floor(c * 100d + 0.5d) / 100d
}
