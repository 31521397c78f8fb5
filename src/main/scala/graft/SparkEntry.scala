package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries; `oracleSql`
  * carries the DuckDB-equivalent SQL for the hash-compare gate. Column names
  * and row order are deterministic on both sides (see QueryDsl).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-hop broadcast join + exact-decimal aggregation: revenue per
    * region/market segment over customer⋈nation⋈region⋈orders. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    val o = Tables.orders(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        QueryDsl.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("r_name", "c_mktsegment")
  }

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Parity.queries, operators.Parity.oracle),
      (operators.Relational.queries, operators.Relational.oracle),
      (operators.Extraction.queries, operators.Extraction.oracle),
      (operators.Events.queries, operators.Events.oracle),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracle),
      (operators.BpeTrain.queries, operators.BpeTrain.oracle),
      (operators.CorpusClean.queries, operators.CorpusClean.oracle),
      (operators.Pipeline.queries, operators.Pipeline.oracle),
      (operators.Dedup.queries, operators.Dedup.oracle),
      (operators.Similarity.queries, operators.Similarity.oracle),
      (multimodal.Media.queries, multimodal.Media.oracle),
      (operators.Sketches.queries, operators.Sketches.oracle),
      (operators.Bucketing.queries, operators.Bucketing.oracle),
      (operators.Skew.queries, operators.Skew.oracle),
      (operators.Formats.queries, operators.Formats.oracle),
      (operators.Layout.queries, operators.Layout.oracle),
      (operators.Cbo.queries, operators.Cbo.oracle),
      (streaming.Streams.queries, streaming.Streams.oracle),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_._1.keys)
    // toMap would silently keep one of two same-named queries
    require(all.distinct.size == all.size,
      s"duplicate query names across modules: ${all.diff(all.distinct).distinct.mkString(", ")}")
    modules.iterator.flatMap(_._1).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  lazy val oracleSql: Map[String, String] = {
    val m = modules.iterator.flatMap(_._2).toMap
    val orphans = m.keySet.diff(queries.keySet)
    require(orphans.isEmpty, s"oracle entries without a query: ${orphans.mkString(", ")}")
    m
  }
}
