package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native SimHash16 expression vs the declarative fold it replaced
  * (operators.Dedup.simhash through round 5 — the BENCH_r05 slope-gate
  * flag), plus SQL registration and null semantics. */
class SimHash16Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** The round-5 declarative formulation, kept here as the executable
    * spec of the semantics: per-word 16-bit md5-prefix value, per-bit
    * strict-majority vote, MSB-first bit weights. */
  private def simhashFold(ws: Column): Column = {
    val hvs = transform(ws, w => conv(substring(md5(w.cast("binary")), 1, 4), 16, 10).cast("int"))
    val powers = array((0 until 16).map(j => lit(1 << (15 - j))): _*)
    val bitsSet = transform(sequence(lit(0), lit(15)), j => {
      val p = element_at(powers, j + lit(1))
      val pos = aggregate(hvs, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(p) > 0, 1).otherwise(0))
      when(pos * 2 > size(hvs), p).otherwise(0)
    })
    aggregate(bitsSet, lit(0), (acc, v) => acc + v)
  }

  test("native expression is bit-identical to the declarative fold on real docs") {
    val ws = array_distinct(split(col("text"), " "))
    val both = graft.Tables.documents(s, TestSpark.sf)
      .select(
        SimHash16(ws).as("native"),
        simhashFold(ws).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(both.count() == 0, "native simhash16 must match the interpreted fold")
  }

  test("simhash16 is registered as a SQL function via extensions") {
    val viaSql = s.sql("SELECT simhash16(array('spark', 'hash')) AS h").collect().head.getInt(0)
    import s.implicits._
    val viaApi = Seq(Seq("spark", "hash")).toDF("w")
      .select(SimHash16(col("w"))).collect().head.getInt(0)
    assert(viaSql == viaApi)
    assert(viaSql >= 0 && viaSql < (1 << 16))
  }

  test("null semantics mirror the fold: null element counts in the denominator only") {
    val rows = s.sql(
      """SELECT simhash16(array('spark', CAST(NULL AS STRING), CAST(NULL AS STRING))) AS diluted,
        |       simhash16(array('spark')) AS solo,
        |       simhash16(CAST(array() AS ARRAY<STRING>)) AS empty,
        |       simhash16(CAST(NULL AS ARRAY<STRING>)) AS nullArr
        |""".stripMargin).collect().head
    // one word + two nulls: no bit reaches a strict majority of 3 -> 0
    assert(rows.getInt(0) == 0, "null elements dilute the majority like size(hvs) did")
    assert(rows.getInt(1) != 0, "a single word sets its own bits (majority of 1)")
    assert(rows.getInt(2) == 0, "empty array -> 0, matching aggregate over empty bitsSet")
    assert(rows.isNullAt(3), "null input -> null output (nullSafeEval)")
  }
}
