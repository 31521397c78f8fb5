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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_salted_join" -> (saltedJoin _),
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
  )
}
