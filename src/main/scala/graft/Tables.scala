package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables lazily, so Catalyst sees the scan and can push filters
  * and prune columns down to the parquet reader. At cluster scale the same
  * code reads a partitioned table from distributed storage — nothing here is
  * local-mode specific.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet logical type the upstream
    * writer chose; at cluster scale an engine cannot assume one encoding.
    * Normalize every shape seen so far to an instant `TimestampType` in
    * ONE place (the session zone is pinned to UTC in [[GraftSession]], so
    * both conversions below are exact and zone-free):
    *
    *  - TIMESTAMP(NANOS): Spark has no native type; sessions set
    *    spark.sql.legacy.parquet.nanosAsLong=true so the scan yields Long
    *    nanos. Integer division (`div`) is mandatory: `/` on longs is
    *    double division, and epoch nanos (~1.7e18) exceed double's 53-bit
    *    mantissa, so the truncating cast would land 1µs low on ~2% of
    *    rows. `ts div 1000` is exact for any Long nanos.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which strict chrono functions (`unix_micros`)
    *    reject. Cast to TimestampType — exact under the UTC session zone
    *    (wall clock == instant).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=true): already TimestampType;
    *    pass through. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"), "ts")

  /** dtype-dispatching timestamp normalizer — see [[events]] for the
    * contract. Kept separate so specs can exercise all three input
    * shapes against one code path (no per-call-site guards). */
  def normalizeTs(raw: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema(c).dataType match {
      case LongType         => raw.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => raw.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
