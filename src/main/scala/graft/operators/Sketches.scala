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

  private val KmvK = 32

  /** KMV distinct sketch per event_type — the ORACLE-CHECKABLE sketch:
    * unlike HLL++ (above, rows-only), the KMV state is a deterministic
    * function of the value set (the k smallest portable md5-derived
    * hashes — [[graft.functions.KmvHashes]], the engine's custom
    * TypedImperativeAggregate), so the driver hash-compares the sketch
    * CONTENTS row-for-row against a windowed-SQL recompute, estimate
    * included. Groups with fewer than k distinct values report their
    * exact size — the sketch degrades to exact, as KMV should.
    *
    * Scale shape: O(k) mergeable buffers, map-side combined; output is
    * O(types × k) rows. */
  def kmvDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr(s"kmv_hashes(cast(user_id as string), $KmvK)").as("hs"))
      .select(col("event_type"),
        when(size(col("hs")) < lit(KmvK), size(col("hs")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * 4294967296.0)
            / element_at(col("hs"), size(col("hs"))).cast("double"))
          .as("est_distinct"),
        posexplode(col("hs")).as(Seq("rank", "h")))
      .select(col("event_type"), col("rank"), col("h"), col("est_distinct"))
      .orderBy("event_type", "rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_approx_distinct" -> (approxDistinct _),
    "k_approx_quantiles" -> (approxQuantiles _),
    "k_kmv_distinct" -> (kmvDistinct _),
  )

  /** HLL/percentile sketch outputs are engine-specific (rows-only); the
    * KMV sketch is deterministic by construction and fully checked. */
  val oracle: Map[String, String] = Map(
    "k_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |             ${graft.QueryDsl.sqlHex8("md5(CAST(user_id AS VARCHAR))", 1)} AS h
         |           FROM events),
         |r AS (SELECT event_type, h,
         |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM h),
         |f AS (SELECT event_type, h, rn FROM r WHERE rn <= $KmvK)
         |SELECT event_type, CAST(rn - 1 AS INT) AS rank, h,
         |       CASE WHEN MAX(rn) OVER (PARTITION BY event_type) < $KmvK
         |            THEN CAST(MAX(rn) OVER (PARTITION BY event_type) AS DOUBLE)
         |            ELSE ${(KmvK - 1).toDouble} * 4294967296.0
         |                 / CAST(MAX(h) OVER (PARTITION BY event_type) AS DOUBLE)
         |       END AS est_distinct
         |FROM f
         |ORDER BY event_type, rank""".stripMargin,
  )
}
