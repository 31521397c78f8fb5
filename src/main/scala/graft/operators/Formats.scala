package graft.operators

import graft.QueryDsl.{dsum, sqlDsum}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format breadth: the engine reads/writes every Spark-native columnar and
  * text format. `k_format_roundtrip` proves ORC and JSON-lines fidelity
  * through the correctness gate: a lineitem slice is written to both
  * formats, read back, the two read-backs are JOINED line-for-line, and
  * the aggregate must match an oracle computed from the original parquet —
  * any dropped row, reordered line, or corrupted value diverges.
  *
  * Column choice is deliberate: long/int/double/string survive JSON
  * losslessly (Jackson shortest-round-trip doubles); timestamps would
  * pull in timezone-format concerns that belong to the source config, not
  * this fidelity check. The two read-backs are aggregated independently
  * and joined on the group key (the synthetic lineitem has duplicate
  * (orderkey, linenumber) pairs, so no line-level key exists): equal
  * counts and exact-decimal sums per group prove neither format dropped,
  * duplicated, or perturbed a row. */
object Formats {

  def formatRoundtrip(s: SparkSession, d: String): DataFrame = {
    val slice = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
    val base = graft.TempPaths.scratch(s, "fmt")
    slice.write.mode("overwrite").orc(s"$base/orc")
    slice.write.mode("overwrite").json(s"$base/json")
    val orc = s.read.orc(s"$base/orc")
    val jsn = s.read
      .schema("l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_quantity DOUBLE")
      .json(s"$base/json")
    def perFlag(df: DataFrame, n: String, qty: String): DataFrame =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as(n), dsum(col("l_quantity")).as(qty))
    perFlag(orc, "n_lines", "qty_orc")
      .join(perFlag(jsn, "n_lines_json", "qty_json"), "l_returnflag")
      .select(col("l_returnflag"), col("n_lines"), col("n_lines_json"),
        col("qty_orc"), col("qty_json"))
      .orderBy("l_returnflag")
  }

  /** Parquet SCHEMA EVOLUTION — the drift every multi-year 100 TB table
    * accumulates: batch 1 writes (key, old_metric), batch 2 adds a column
    * and drops the old one (key, new_metric), and a `mergeSchema` read
    * reconciles both generations into one frame with nulls where a
    * generation lacks the column. The oracle rebuilds the union
    * relationally from the source table, so the merged read must neither
    * lose a generation nor misalign a column. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val base = graft.TempPaths.scratch(s, "schema_evo")
    val o = Tables.orders(s, d).filter(col("o_orderkey") % 50 === 0)
    o.filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("old_metric"))
      .write.mode("overwrite").parquet(s"$base/gen=1")
    o.filter(col("o_orderkey") % 100 =!= 0)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("new_metric"))
      .write.mode("overwrite").parquet(s"$base/gen=2")
    s.read.option("mergeSchema", "true").parquet(base)
      .select(col("o_orderkey"), col("old_metric"), col("new_metric"), col("gen"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_format_roundtrip" -> (formatRoundtrip _),
    "k_schema_evolution" -> (schemaEvolution _),
  )

  val oracle: Map[String, String] = Map(
    // computed straight from parquet: both format paths must agree with it
    "k_format_roundtrip" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines, COUNT(*) AS n_lines_json,
         |       ${sqlDsum("l_quantity")} AS qty_orc,
         |       ${sqlDsum("l_quantity")} AS qty_json
         |FROM lineitem WHERE l_orderkey % 100 = 0
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,
    // the relational truth of the two write generations: the merged read
    // must reproduce it exactly, nulls where a generation lacks a column
    "k_schema_evolution" ->
      """SELECT o_orderkey, o_totalprice AS old_metric,
        |       CAST(NULL AS DOUBLE) AS new_metric, CAST(1 AS INT) AS gen
        |FROM orders WHERE o_orderkey % 100 = 0
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS DOUBLE) AS old_metric,
        |       o_totalprice * 2 AS new_metric, CAST(2 AS INT) AS gen
        |FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 100 <> 0
        |ORDER BY o_orderkey""".stripMargin,
  )
}
