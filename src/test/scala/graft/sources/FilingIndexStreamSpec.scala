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

  test("admission control paces a backlog and restart mid-drain stays exactly-once") {
    val staged = FilingIndex.ensureStaged(s, TestSpark.sf)
    val root = java.nio.file.Files.createTempDirectory("fis_paced").toString
    val arrivals = s"$root/arrivals"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals))
    val files = new java.io.File(staged).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    def arrive(fs: Seq[java.io.File], from: Int): Unit = fs.zipWithIndex.foreach {
      case (f, i) => java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(arrivals, "backlog-%03d.jsonl".format(from + i))): Unit
    }
    // unit-level pacing arithmetic: a backlog of N files advances the
    // cursor by exactly min(limit, remaining) per trigger
    arrive(files.toSeq, 0)
    val stream = new FilingIndexStream.IndexMicroBatchStream(arrivals, Some(2))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    def paced(from: Int): Int = stream
      .latestOffset(FilingIndexStream.FileCountOffset(from), ReadLimit.maxFiles(2))
      .asInstanceOf[FilingIndexStream.FileCountOffset].n
    assert((0 to files.length).map(paced) ==
      (0 to files.length).map(a => math.min(files.length, a + 2)),
      "latestOffset(start, maxFiles(2)) must stride by exactly 2 until drained")
    assert(stream.latestOffset(FilingIndexStream.FileCountOffset(0),
        ReadLimit.allAvailable())
      .asInstanceOf[FilingIndexStream.FileCountOffset].n == files.length)
    intercept[UnsupportedOperationException](stream.latestOffset())
    // end-to-end: drain 2 files in one paced batch, stop with the
    // checkpoint MID-BACKLOG, let 6 more arrive, restart — the resumed
    // query must skip the ingested prefix and pace the rest
    val arrivals2 = s"$root/arrivals2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(arrivals2))
    def arrive2(fs: Seq[java.io.File], from: Int): Unit = fs.zipWithIndex.foreach {
      case (f, i) => java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(arrivals2, "backlog-%03d.jsonl".format(from + i))): Unit
    }
    def runOnce(): Int = {
      val q = s.readStream.format(classOf[FilingIndexStream].getName)
        .option("maxFilesPerTrigger", 2).load(arrivals2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        q.recentProgress.count(_.numInputRows > 0)
      } finally q.stop()
    }
    val total = FilingIndex.filingIndex(s, TestSpark.sf).drop("doc_url").count() * 3
    arrive2(files.take(2).toSeq, 0)
    assert(runOnce() == 1, "2 files fit one paced trigger")
    val afterTwoFiles = s.read.parquet(out).count()
    // range-partitioned staging makes per-file counts uneven — assert the
    // checkpoint genuinely sits mid-backlog, not an exact row split
    assert(afterTwoFiles > 0 && afterTwoFiles < total)
    arrive2(files.drop(2).toSeq, 2)
    val batches = runOnce() // resumes at offset 2 with a 6-file backlog
    assert(batches >= 3,
      s"6 backlogged files at 2 per trigger need ≥3 paced batches, got $batches")
    val rows = s.read.parquet(out)
    val dups = rows.groupBy(col("cik"), col("accession_number"))
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "mid-backlog restart re-ingested files")
    assert(rows.count() == total,
      "expected every filing exactly once after the paced drain")
  }

  test("AvailableNow pins the feed end: post-pin arrivals wait for the next run") {
    val staged = FilingIndex.ensureStaged(s, TestSpark.sf)
    val root = java.nio.file.Files.createTempDirectory("fis_an").toString
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
    def backfillOnce(): Unit = {
      val q = s.readStream.format(classOf[FilingIndexStream].getName)
        .option("maxFilesPerTrigger", 2).load(arrivals)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
      finally q.stop()
    }
    arrive(files.take(files.length / 2).toSeq, 1)
    backfillOnce()
    val afterRun1 = s.read.parquet(out).count()
    assert(afterRun1 > 0)
    // wave 2 lands AFTER run 1's pin: a fresh AvailableNow run drains
    // exactly the remainder from the checkpointed offset
    arrive(files.drop(files.length / 2).toSeq, 2)
    backfillOnce()
    val rows = s.read.parquet(out)
    assert(rows.count() > afterRun1, "wave 2 never ingested by the second run")
    val dups = rows.groupBy(col("cik"), col("accession_number"))
      .count().filter(col("count") > 1).count()
    assert(dups == 0, "the second backfill re-ingested run-1 files")
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
