package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Contract test for [[Tables.normalizeTs]]: the engine must ingest `ts`
  * in every parquet logical type an upstream writer may choose and land
  * on identical instant micros. The driver has regenerated the fixtures
  * with a different encoding once already (NANOS → MICROS/NTZ between
  * rounds 8 and 9, killing nine queries at analysis time); this spec
  * writes all three shapes itself so a future flip is caught in `sbt
  * test`, not in the correctness gate.
  *
  * Shapes covered (session zone is UTC, so wall clock == instant):
  *  - Long nanos — what TIMESTAMP(NANOS) scans yield under
  *    spark.sql.legacy.parquet.nanosAsLong=true;
  *  - TIMESTAMP_NTZ — parquet TIMESTAMP(MICROS, isAdjustedToUTC=false);
  *  - TIMESTAMP — parquet TIMESTAMP(MICROS, isAdjustedToUTC=true).
  */
class TablesTsContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Wall-clock instants exercising sub-second micros and a non-round nano tail
  // (the nanos branch must truncate, not round, to match parquet MICROS).
  private val micros = Seq(0L, 1700000000000001L, 1700000000123456L, 1765432109876543L)

  private def roundTrip(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val dir = Files.createTempDirectory("ts-shape").toString
    df.write.mode("overwrite").parquet(dir)
    val back = Tables.normalizeTs(spark.read.parquet(dir), "ts")
    assert(back.schema("ts").dataType == TimestampType,
      s"normalizeTs must land on TimestampType, got ${back.schema("ts").dataType}")
    // unix_micros is the strict call site that rejected NTZ in round 9 —
    // resolving here IS part of the contract, not just a readback aid.
    back.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
  }

  test("Long nanos, TIMESTAMP_NTZ, and instant TIMESTAMP all normalize to identical micros") {
    val fromNanos = roundTrip(
      micros.map(_ * 1000L).toDF("ts")) // LongType column: the nanosAsLong scan shape
    val fromNtz = roundTrip(
      micros.toDF("us").select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val fromInstant = roundTrip(
      micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))

    assert(fromNanos == micros.sorted)
    assert(fromNtz == micros.sorted)
    assert(fromInstant == micros.sorted)
  }

  test("nanos branch truncates exactly (no double-division drift at epoch scale)") {
    // 1.7e18 ns exceeds double's 53-bit mantissa; a double path would land
    // 1µs low on some of these. Offsets 0..999 ns must all floor to the
    // same microsecond.
    val base = 1700000000123456L
    val nanos = Seq(0L, 1L, 499L, 999L).map(base * 1000L + _)
    val got = roundTrip(nanos.toDF("ts"))
    assert(got == Seq(base, base, base, base))
  }

  test("Tables.events yields TimestampType on the current fixtures") {
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.schema("ts").dataType == TimestampType)
    // The round-9 failure mode: unix_micros on the raw scan threw at analysis.
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
