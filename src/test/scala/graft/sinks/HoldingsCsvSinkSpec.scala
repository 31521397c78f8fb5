package graft.sinks

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** K1 layout tests (SURVEY.md §2 K1, §7.4): one CSV per reporting date,
  * header, no date column in the file, exact reference filenames, and G2
  * last-write-wins across filings sharing a date. */
class HoldingsCsvSinkSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def freshDir(): Path = Files.createTempDirectory("graft_sink_")

  private def sample() = {
    import s.implicits._
    Seq(
      // filing 1 and filing 2 share 2023-03-31; filing 2 must win wholesale
      (1L, "2023-03-31", "Stale Corp", "1", "10", "0.1"),
      (2L, "2023-03-31", "Fresh Corp", "2", "20", "0.2"),
      (2L, "2023-03-31", "Fresh LLC", "3", "30", "0.3"),
      (3L, "2023-06-30", "Solo Inc", "4", "40", "0.4"))
      .toDF("filing_seq", "reporting_date", "issuer", "shares", "value_usd", "pct_net_assets")
  }

  test("reference filename layout + LWW + header + no date column") {
    val out = freshDir()
    HoldingsCsvSink.write(sample(), out.toString, exactFilenames = true)
    val files = Files.list(out).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".csv")).toList.sorted
    assert(files == List("2023-03-31_NPORT-P_HOLDINGS.csv", "2023-06-30_NPORT-P_HOLDINGS.csv"))
    val march = Files.readAllLines(out.resolve("2023-03-31_NPORT-P_HOLDINGS.csv")).asScala.toList
    assert(march.head == "issuer,shares,value_usd,pct_net_assets") // header, no index, no date
    assert(march.tail.toSet == Set("Fresh Corp,2,20,0.2", "Fresh LLC,3,30,0.3")) // filing 1 gone
    val june = Files.readAllLines(out.resolve("2023-06-30_NPORT-P_HOLDINGS.csv")).asScala.toList
    assert(june.tail == List("Solo Inc,4,40,0.4"))
  }

  test("spark-native layout keeps partition directories") {
    val out = freshDir()
    HoldingsCsvSink.write(sample(), out.toString)
    val dirs = Files.list(out).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("reporting_date=")).toList.sorted
    assert(dirs == List("reporting_date=2023-03-31", "reporting_date=2023-06-30"))
  }
}
