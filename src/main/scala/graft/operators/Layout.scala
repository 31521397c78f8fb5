package graft.operators

import graft.QueryDsl.{dsum, sqlDsum}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data layout for scan efficiency — the piece of 100 TB engineering that
  * happens BEFORE any query runs: stage the events fact table
  * date-partitioned (one directory per day, one file per day here; a few
  * hundred size-bounded files per day on a cluster) and time-sorted within
  * files, so that
  *   1. a date-range predicate prunes PARTITIONS — the scan never opens a
  *      file outside the range (LayoutSpec asserts `inputFiles` covers
  *      exactly the filtered days), and
  *   2. within surviving files, the ts sort gives parquet page/row-group
  *      min-max statistics real selectivity for time predicates.
  * At 100 TB this is the difference between a 3-day dashboard query
  * scanning ~0.1% of the table and scanning all of it. The staged layout
  * is built once per sf dir (marker file, the DocStage/ANN pattern).
  */
object Layout {

  def layoutDir(sfDir: String): String =
    "/tmp/graft_stage/layout_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private[operators] val buildCount = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Stage events partitioned by event_date, ts-sorted within partitions.
    * `repartition(event_date)` puts each day wholly in one task so each
    * partition directory holds one file; a cluster would instead
    * `repartitionByRange(n, event_date, ts)` to get several time-ordered,
    * size-bounded files per day. */
  def ensureLayout(s: SparkSession, d: String): String = {
    val dir = layoutDir(d)
    val marker = java.nio.file.Paths.get(dir, "_STAGED")
    if (!java.nio.file.Files.exists(marker)) synchronized {
      if (!java.nio.file.Files.exists(marker)) {
        buildCount.incrementAndGet()
        Tables.events(s, d)
          .withColumn("event_date", to_date(col("ts")))
          .repartition(col("event_date"))
          .sortWithinPartitions(col("ts"), col("event_id"))
          .write.partitionBy("event_date").mode("overwrite").parquet(dir)
        java.nio.file.Files.write(marker, Array.emptyByteArray)
      }
    }
    dir
  }

  private[operators] def stagedEvents(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ensureLayout(s, d))

  private val From = "2024-01-10"
  private val To = "2024-01-12"

  /** The dashboard-shaped query the layout exists for: 3 of 30 days,
    * per-day/per-type counts and exact sums. The date filter lands in the
    * scan's PartitionFilters, so 27 of 30 directories are never opened. */
  def layoutPrune(s: SparkSession, d: String): DataFrame =
    stagedEvents(s, d)
      .filter(col("event_date").between(lit(From).cast("date"), lit(To).cast("date")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("event_date", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_layout_prune" -> (layoutPrune _),
  )

  val oracle: Map[String, String] = Map(
    // the oracle reads the ORIGINAL events parquet: the staged layout must
    // change the scan cost, never the answer
    "k_layout_prune" ->
      s"""SELECT CAST(ts AS DATE) AS event_date, event_type,
         |       COUNT(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events
         |WHERE CAST(ts AS DATE) BETWEEN DATE '$From' AND DATE '$To'
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
  )
}
