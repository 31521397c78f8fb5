package graft.operators

import graft.QueryDsl.{dsum, sqlDsum}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the manual form of skew
  * mitigation for the cases AQE's skew-join splitting can't reach (AQE
  * splits oversized sort-merge partitions at runtime, but a join key with
  * 3 distinct values gives the planner only 3 meaningful partitions to
  * begin with).
  *
  * Pattern: the skewed fact side appends a salt in [0, S); the small-but-
  * not-broadcastable dim side is replicated S× (explode over the salt
  * range); the join key becomes (key, salt), multiplying reducer
  * parallelism by S. Results are identical to the unsalted join — the
  * oracle verifies against the plain formulation.
  */
object Skew {

  private val Salts = 8

  /** Join 600k lineitem rows to a 3-row derived dimension on
    * `l_returnflag` (3 distinct values — maximal skew), salted. The merge
    * hint forces a shuffle join: broadcasting the dim would dodge the
    * skew problem this operator exists to solve (at 100 TB the dim side
    * may not be broadcastable). */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val dim = li.groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("flag_rows"))
    val fact = li
      .select(col("l_returnflag"), col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .withColumn("salt", pmod(col("l_orderkey"), lit(Salts)))
    val dimSalted = dim
      .select(col("flag"), col("flag_rows"),
        explode(sequence(lit(0), lit(Salts - 1))).as("salt"))
    fact.hint("merge")
      .join(dimSalted,
        fact("l_returnflag") === dimSalted("flag") && fact("salt") === dimSalted("salt"))
      .groupBy(col("l_returnflag"), col("flag_rows"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("rev")).as("revenue"))
      .orderBy("l_returnflag")
  }

  private val SkewTopK = 10

  /** JOIN-KEY SKEW DIAGNOSTIC — the measurement that decides between a
    * plain shuffle join, AQE skew splitting, and [[saltedJoin]]-style
    * salting: per-key row counts reduced to the top-K heaviest keys,
    * each annotated with corpus-level context (total rows, distinct
    * keys, the key's share and its skew factor = share × distinct-keys,
    * i.e. how many times the mean key weight it carries). Shape: ONE
    * map-side-combined aggregate to O(keys) rows, a driver-free top-K
    * (TakeOrdered — no global sort shuffle), and a broadcast of the
    * one-row totals; the fact table is scanned once. The two ratios are
    * single IEEE divisions of exact integers — bit-identical in any
    * engine. */
  def skewStats(s: SparkSession, d: String): DataFrame = {
    val perKey = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    perKey.orderBy(col("cnt").desc, col("user_id")).limit(SkewTopK)
      .crossJoin(broadcast(totals))
      .select(col("user_id"), col("cnt"), col("total_rows"), col("n_keys"),
        (col("cnt").cast("double") / col("total_rows").cast("double")).as("share"),
        ((col("cnt") * col("n_keys")).cast("double") / col("total_rows").cast("double"))
          .as("skew_factor"))
      .orderBy(col("cnt").desc, col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_salted_join" -> (saltedJoin _),
    "k_skew_stats" -> (skewStats _),
  )

  val oracle: Map[String, String] = Map(
    // the oracle runs the UNSALTED join: salting must not change results
    "k_salted_join" ->
      s"""WITH dim AS (
         |  SELECT l_returnflag AS flag, COUNT(*) AS flag_rows
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, flag_rows, COUNT(*) AS n_lines,
         |       ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN dim ON l_returnflag = flag
         |GROUP BY l_returnflag, flag_rows
         |ORDER BY l_returnflag""".stripMargin,
    "k_skew_stats" ->
      s"""WITH pk AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
         |            FROM events GROUP BY user_id),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
         |               CAST(COUNT(*) AS BIGINT) AS n_keys FROM pk),
         |top AS (SELECT user_id, cnt FROM pk
         |        ORDER BY cnt DESC, user_id LIMIT $SkewTopK)
         |SELECT t.user_id, t.cnt, o.total_rows, o.n_keys,
         |       CAST(t.cnt AS DOUBLE) / CAST(o.total_rows AS DOUBLE) AS share,
         |       CAST(t.cnt * o.n_keys AS DOUBLE) / CAST(o.total_rows AS DOUBLE) AS skew_factor
         |FROM top t CROSS JOIN tot o
         |ORDER BY t.cnt DESC, t.user_id""".stripMargin,
  )
}
