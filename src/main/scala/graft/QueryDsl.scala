package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for oracle-checkable queries.
  *
  * Cross-engine determinism rules (SURVEY.md §7.4):
  *   - Floating-point SUM/AVG accumulate in partition order, which differs
  *     between Spark and the DuckDB oracle. `dsum` casts each addend to an
  *     exact DECIMAL first, sums exactly, then casts the total back to
  *     double — bit-identical in any engine and any partitioning, at any
  *     scale. (Double→decimal rounding is itself deterministic: a binary
  *     double can never sit exactly on a 1e-4 decimal midpoint, so
  *     HALF_UP-vs-HALF_EVEN differences cannot fire.)
  *   - Every query ends in a total ORDER BY so row order is deterministic.
  *   - Every computed column is aliased identically in Spark and SQL.
  */
object QueryDsl {
  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)

  /** Exact average: decimal sum / count, one final double division. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(28, 4))).cast(DoubleType) / count(c)).cast(DoubleType)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"

  /** DuckDB fragment parsing 8 hex chars of `m` (a hex-string expression)
    * from 1-based position `s` into a BIGINT — DuckDB 1.0 has no conv();
    * mirrors Spark's `conv(substring(m, s, 8), 16, 10)`. Used wherever an
    * oracle must reproduce md5-derived integers (MinHash, SRP hyperplanes,
    * hash-split assignment). */
  def sqlHex8(m: String, s: Int): String =
    (0 until 8).map { k =>
      val mult = math.pow(16, 7 - k).toLong
      s"(strpos('0123456789abcdef', substr($m, ${s + k}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")
}
