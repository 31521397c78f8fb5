package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located join — the zero-shuffle fact-fact join pattern
  * (SURVEY.md §7 scale notes; at 100 TB the orders⋈lineitem shuffle is
  * the single largest data movement in the relational layer, and
  * pre-bucketing both tables on the join key eliminates it for every
  * downstream join at the cost of one write).
  *
  * Tables are staged once per sf dir as Hive-bucketed managed tables
  * (16 buckets on the order key, sorted within buckets). The join then
  * plans as SortMergeJoin with NO shuffle exchange on either side —
  * BucketingSpec asserts that property on the physical plan.
  */
object Bucketing {

  private val Buckets = 16

  private def tbl(sfDir: String, base: String): String =
    ("graft_b_" + base + "_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")).toLowerCase

  private def clearStaleLocation(s: SparkSession, table: String): Unit = {
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists; saveAsTable refuses a pre-existing location
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists) rm(dir)
  }

  /** Stage bucketed copies of orders+lineitem once per sf dir. */
  def ensureBucketed(s: SparkSession, d: String): (String, String) = {
    val (ot, lt) = (tbl(d, "orders"), tbl(d, "lineitem"))
    if (!s.catalog.tableExists(ot)) {
      clearStaleLocation(s, ot)
      Tables.orders(s, d).write
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ot)
    }
    if (!s.catalog.tableExists(lt)) {
      clearStaleLocation(s, lt)
      Tables.lineitem(s, d).write
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(lt)
    }
    (ot, lt)
  }

  /** Fact-fact join over the bucketed tables: revenue per order status.
    * Both sides read pre-bucketed on the join key → no join shuffle. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (ot, lt) = ensureBucketed(s, d)
    val o = s.table(ot)
    val l = s.table(lt)
    // merge hint: without it the planner would broadcast the smaller side
    // at test scale and never exercise the bucketed SMJ path
    o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        graft.QueryDsl.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** `k_join_strategy` — the BROADCAST-THRESHOLD decision made visible:
    * the same supplier⋈nation join executed twice under scoped
    * thresholds, once with broadcast allowed (must plan
    * BroadcastHashJoin — zero shuffle of the big side) and once with it
    * disabled (must plan a shuffle join), both REQUIREd from the
    * executed plans and both answers identical. At 100 TB this
    * threshold is the single most-consulted knob in the planner — which
    * side fits executor memory decides whether a join moves gigabytes
    * or nothing — and the demo pins that the knob changes PLANS, never
    * ANSWERS. One output row per strategy so the equality is itself
    * hash-checked. */
  def joinStrategy(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(key)
    def runWith(threshold: String, expect: String, forbid: String): Array[org.apache.spark.sql.Row] = {
      s.conf.set(key, threshold)
      try {
        val j = Tables.supplier(s, d)
          .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            graft.QueryDsl.dsum(col("s_acctbal")).as("total_bal"))
        val rows = j.collect()
        val plan = j.queryExecution.executedPlan.toString
        require(plan.contains(expect) && !plan.contains(forbid),
          s"threshold $threshold expected $expect (not $forbid); plan:\n$plan")
        rows
      } finally s.conf.set(key, prev)
    }
    val bhj = runWith("64MB", "BroadcastHashJoin", "SortMergeJoin")
    val smj = runWith("-1", "SortMergeJoin", "BroadcastHashJoin")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_suppliers",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("total_bal",
        org.apache.spark.sql.types.DoubleType)))
    def tag(rows: Array[org.apache.spark.sql.Row], m: String) =
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
        .select(lit(m).as("strategy"), col("n_name"), col("n_suppliers"), col("total_bal"))
    tag(bhj, "broadcast").unionByName(tag(smj, "shuffle"))
      .orderBy("strategy", "n_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_bucketed_join" -> (bucketedJoin _),
    "k_join_strategy" -> (joinStrategy _),
  )

  val oracle: Map[String, String] = Map(
    // the oracle reads the ORIGINAL parquet — bucketing must not change
    // the answer, only the plan
    "k_bucketed_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_lines,
         |       ${graft.QueryDsl.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // one plain join, emitted once per strategy label: both physical
    // strategies must land on the identical rows
    "k_join_strategy" ->
      s"""WITH j AS (
         |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         |         ${graft.QueryDsl.sqlDsum("s_acctbal")} AS total_bal
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY n_name)
         |SELECT s.strategy, j.n_name, j.n_suppliers, j.total_bal
         |FROM j CROSS JOIN (SELECT unnest(['broadcast', 'shuffle']) AS strategy) s
         |ORDER BY s.strategy, j.n_name""".stripMargin,
  )
}
