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
  * Mirror SQL (DuckDB): `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
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

  /** SQL-side equivalents (kept next to the Scala so they can't drift). */
  def sqlDsum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT(*)"
  def sqlDsumHp(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,12))) AS DOUBLE)"
}
