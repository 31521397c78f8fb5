package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The custom micro-batch source's exactly-once contract ACROSS RESTARTS:
  * a query ingests wave 1, stops, a NEW query resumes from the same
  * checkpoint after wave 2 arrives, and the durable sink holds every
  * filing exactly once — the checkpointed file-count offset is what makes
  * the second query skip wave 1. Plus the append-only guard. */
class FilingIndexStreamSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("checkpointed offsets make restart exactly-once over the arrivals") {
    val staged = FilingIndex.ensureStaged(s, TestSpark.sf)
    val root = java.nio.file.Files.createTempDirectory("fis_spec").toString
    val arrivals = s"$root/arrivals"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals))
    val files = new java.io.File(staged).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    def arrive(fs: Seq[java.io.File], wave: Int): Unit = fs.zipWithIndex.foreach {
      case (f, i) => java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(arrivals, f"wave$wave%02d-$i%03d.jsonl")): Unit
    }
    def runOnce(): Unit = {
      val q = s.readStream.format(classOf[FilingIndexStream].getName).load(arrivals)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    arrive(files.take(files.length / 2).toSeq, 1)
    runOnce()
    val afterWave1 = s.read.parquet(out).count()
    assert(afterWave1 > 0)
    arrive(files.drop(files.length / 2).toSeq, 2)
    runOnce() // a NEW query resuming from the checkpointed offset
    val rows = s.read.parquet(out)
    val total = rows.count()
    val expected = FilingIndex.filingIndex(s, TestSpark.sf)
      .drop("doc_url").count() * 3 // stream has no NPORT filter: all forms
    // every filing exactly once: no wave-1 re-ingestion on restart
    val dups = rows.groupBy(col("cik"), col("accession_number"))
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "restart re-ingested wave-1 filings")
    assert(total > afterWave1, "wave 2 never ingested")
    assert(total == expected, s"expected $expected filings exactly once, got $total")
  }

  test("a non-append arrival (offset beyond listing) fails loudly, not silently") {
    val stream = new FilingIndexStream.IndexMicroBatchStream(
      java.nio.file.Files.createTempDirectory("fis_empty").toString)
    intercept[IllegalArgumentException] {
      stream.planInputPartitions(
        FilingIndexStream.FileCountOffset(0), FilingIndexStream.FileCountOffset(3))
    }
  }
}
