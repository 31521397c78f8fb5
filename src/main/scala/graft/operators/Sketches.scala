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

  private val Pcts = Seq(0.5, 0.95, 0.99)

  /** Approximate p50/p95/p99 of order totals per priority, one row per
    * (priority, percentile) with scalar columns — the array form defeats
    * the driver's row-sorting compare, scalars don't. */
  def approxQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"),
          array(Pcts.map(lit): _*), lit(10000)).as("approx_pcts"),
        expr(s"percentile(o_totalprice, array(${Pcts.mkString(", ")}))").as("exact_pcts"))
      .select(col("o_orderpriority"),
        posexplode(arrays_zip(col("approx_pcts"), col("exact_pcts"))).as(Seq("i", "z")))
      .select(
        col("o_orderpriority"),
        element_at(array(Pcts.map(lit): _*), col("i") + 1).as("pct"),
        col("z.approx_pcts").as("approx"),
        col("z.exact_pcts").as("exact"))
      .orderBy("o_orderpriority", "pct")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_approx_distinct" -> (approxDistinct _),
    "k_approx_quantiles" -> (approxQuantiles _),
  )

  /** Intentionally empty: sketch outputs are engine-specific. */
  val oracle: Map[String, String] = Map.empty
}
