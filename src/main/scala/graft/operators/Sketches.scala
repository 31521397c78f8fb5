package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates — the operators a 100 TB profile pass
  * actually runs (exact distinct counts and percentiles over full data
  * need a full shuffle of every key; sketches are one pass, mergeable,
  * constant memory).
  *
  * Sketch outputs are implementation-defined, so these queries carry NO
  * DuckDB oracle (driver records the weaker rows>0 check); SketchesSpec
  * asserts the approximation error against exact answers instead. The
  * exact columns ride along in the output to make the comparison visible.
  */
object Sketches {

  /** HyperLogLog++ distinct order keys per return flag, with the exact
    * answer alongside. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  /** Approximate p50/p95/p99 of order totals per priority. */
  def approxQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("approx_pcts"),
        expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").as("exact_pcts"))
      .orderBy("o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_approx_distinct" -> (approxDistinct _),
    "k_approx_quantiles" -> (approxQuantiles _),
  )

  /** Intentionally empty: sketch outputs are engine-specific. */
  val oracle: Map[String, String] = Map.empty
}
