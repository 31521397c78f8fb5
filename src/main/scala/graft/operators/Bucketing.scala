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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_bucketed_join" -> (bucketedJoin _),
  )

  val oracle: Map[String, String] = Map(
    // the oracle reads the ORIGINAL parquet — bucketing must not change
    // the answer, only the plan
    "k_bucketed_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_lines,
         |       ${graft.QueryDsl.sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
