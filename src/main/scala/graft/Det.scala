package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle comparison.
  *
  * Floating-point SUM is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's single-node order. We therefore
  * sum *exactly*, in decimal, and only cast to double at the very end:
  * both engines then produce the bit-identical IEEE double. Per-row casts
  * double->decimal round to nearest; a tie IS representable (a double can
  * be exactly k*10^-s + 5*10^-(s+1) when that value is dyadic, e.g.
  * 0.03125 = 1/32 at s=4), but both engines resolve ties identically —
  * Spark's Decimal.changePrecision uses HALF_UP and DuckDB rounds half
  * away from zero (verified: 0.03125 -> 0.0313, -0.03125 -> -0.0313 in
  * both; asserted in PropertySpec) — so per-row casts always agree.
  *
  * Mirror SQL (DuckDB): `CAST(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
  * VARCHAR) AS DOUBLE)`.
  *
  * The final decimal→double conversion matters too (round 11): DuckDB's
  * direct `CAST(DECIMAL AS DOUBLE)` DOUBLE-ROUNDS — int128 → double,
  * then / 10^scale, two roundings — and lands exactly 1 ulp off the
  * correctly-rounded value on ~25% of wide decimals (measured: 50,026 of
  * 200,000 random DECIMAL(28,6) values; first seen live as q1 sum_charge
  * at the 5× tier). Spark's `Decimal.toDouble` (BigDecimal.doubleValue)
  * IS correctly rounded. Routing the oracle through VARCHAR makes DuckDB
  * correctly rounded as well — decimal→varchar is exact digits,
  * varchar→double is a single correctly-rounded parse (0 of 200,000
  * mismatches vs Python's exact conversion) — so both engines emit the
  * bit-identical IEEE double and the comparator needs NO ulp tolerance
  * anywhere (the r10 "1-ulp concession" is retired from tools/check.py).
  */
object Det {
  /** Exact decimal sum of a (possibly computed) double column -> double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal average -> double (exact sum / exact count, one fp op). */
  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  /** High-precision variant for dot products / vector math. */
  def dsumHp(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** SQL-side equivalents (kept next to the Scala so they can't drift).
    * The VARCHAR hop is the correctly-rounded decimal→double path — see
    * the object scaladoc; use [[sqlD2d]] for any ad-hoc oracle decimal.
    */
  def sqlDsum(expr: String, scale: Int = 4): String =
    sqlD2d(s"SUM(CAST(($expr) AS DECIMAL(18,$scale)))")
  def sqlDavg(expr: String, scale: Int = 4): String =
    s"${sqlDsum(expr, scale)} / COUNT(*)"
  def sqlDsumHp(expr: String): String =
    sqlD2d(s"SUM(CAST(($expr) AS DECIMAL(38,12)))")

  /** Correctly-rounded DuckDB decimal→double: exact digits, one parse. */
  def sqlD2d(decimalExpr: String): String =
    s"CAST(CAST($decimalExpr AS VARCHAR) AS DOUBLE)"
}
