package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity layer: the reference's operator inventory (SURVEY.md §2)
  * re-expressed as lazy Spark plans over the driver's testdata tables.
  *
  * Each operator from the reference's eager, row-at-a-time pipeline becomes
  * a declarative transformation Catalyst can optimize (filter pushdown,
  * column pruning, whole-stage codegen). Reference file:line cites point at
  * /root/reference/ETFQuarterlyHoldingsExtractor.py.
  */
object Parity {

  /** F1 — equality-predicate filter (ref :52 `df[df["Form Type"] == "NPORT-P"]`).
    * The predicate is pushed into the parquet scan (PushedFilters). */
  def filterEq(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .orderBy("o_orderkey")

  /** P1 — nested-field projection (ref :45 `data.get("filings").get("recent")`).
    * JSON path descent on the `events.props` document column. */
  def jsonProjection(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy("event_id")

  /** P2 — parallel columnar arrays → rows (ref :46-51). The EDGAR JSON keeps
    * `accessionNumber[]`/`filingDate[]`/… as parallel arrays; the relational
    * form is posexplode. Same shape here: embedding array → (id, pos, val). */
  def zipExplode(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("vec_id"), col("pos"), col("val").cast("double").as("val"))
      .filter(col("vec_id") < 8)
      .orderBy("vec_id", "pos")

  /** E1–E4 — scalar string kernel: concat/format (ref :9,:58), char
    * translate (ref :58 `.replace('-','')`), substring-contains (ref :68 et
    * al), trim (ref :76 `get_text(strip=True)`). All codegen'd builtins. */
  def stringKernel(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit("/"), col("p_name")).as("part_url"),
        translate(col("p_name"), " ", "_").as("name_snake"),
        col("p_type").contains("ECON").as("is_economy"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"))
      .orderBy("p_partkey")

  /** F2 — null-guard filter (ref :150-151, :80-82: skip filing when fetch
    * failed / date absent). Left join then drop the null-keyed rows. */
  def nullGuard(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNotNull)
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** G2 — key-by + last-write-wins upsert (ref :28,:158
    * `master_df_list[reporting_date] = df`, dict overwrite). Distributed
    * form: row_number over (key ORDER BY arrival desc), keep first. */
  def lastWriteWins(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** F3 — input validation (ref :163 `cik.isdigit() and len == 10`) as a
    * relational predicate: rlike on a zero-padded key rendering. */
  def validateCik(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        format_string("%010d", col("c_custkey")).as("cik"))
      .filter(col("cik").rlike("^[0-9]{10}$"))
      .filter(col("c_custkey") < 32)
      .orderBy("c_custkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_filter_eq"       -> (filterEq _),
    "p_json_projection" -> (jsonProjection _),
    "p_zip_explode"     -> (zipExplode _),
    "p_string_kernel"   -> (stringKernel _),
    "p_null_guard"      -> (nullGuard _),
    "p_last_write_wins" -> (lastWriteWins _),
    "p_validate_cik"    -> (validateCik _),
  )

  val oracle: Map[String, String] = Map(
    "p_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,
    "p_json_projection" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "p_zip_explode" ->
      """SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |       CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings WHERE vec_id < 8 ORDER BY vec_id, pos""".stripMargin,
    "p_string_kernel" ->
      """SELECT p_partkey,
        |       p_brand || '/' || p_name AS part_url,
        |       translate(p_name, ' ', '_') AS name_snake,
        |       contains(p_type, 'ECON') AS is_economy,
        |       trim('  ' || p_name || '  ') AS name_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "p_null_guard" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IS NOT NULL
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "p_last_write_wins" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "p_validate_cik" ->
      """SELECT c_custkey, printf('%010d', c_custkey) AS cik
        |FROM customer
        |WHERE regexp_matches(printf('%010d', c_custkey), '^[0-9]{10}$')
        |  AND c_custkey < 32
        |ORDER BY c_custkey""".stripMargin,
  )
}
