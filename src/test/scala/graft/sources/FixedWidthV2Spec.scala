package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Two-phase-commit contract of the V2 fixed-width sink: committed data
  * is byte-deterministic and complete, empty partitions still commit a
  * (0-row) file so file count == task count, temp state never survives a
  * successful job, truncate replaces prior data atomically, and the
  * manifest's counts are the files' truth. */
class FixedWidthV2Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("fwv2_spec").toString + "/t"

  private def writeSlice(target: String, mod: Int, parts: Int, mode: String): Unit =
    graft.Tables.orders(s, TestSpark.sf)
      .filter(col("o_orderkey") % mod === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .repartition(parts, col("o_orderkey"))
      .write.format("graft.sources.FixedWidthV2")
      .option("path", target).mode(mode).save()

  private def manifest(target: String): Seq[String] =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(target, "_MANIFEST")).toArray.toSeq.map(_.toString)

  test("commit publishes exactly one file per task plus a consistent manifest") {
    val t = freshDir()
    writeSlice(t, 10, 3, "append")
    val files = new java.io.File(t).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".fw")) == 3)
    assert(files.contains("_MANIFEST"))
    assert(!files.contains("_temporary"), "temp dir survived a successful commit")
    val m = manifest(t)
    val total = m.find(_.startsWith("TOTAL ")).get.split(" ")(1).toLong
    val expected = graft.Tables.orders(s, TestSpark.sf)
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(total == expected)
    // per-file row counts equal the files' actual line counts
    m.filter(_.startsWith("part-")).foreach { line =>
      val Array(name, rows, _) = line.split(" ")
      val actual = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(t, name)).size.toLong
      assert(actual == rows.toLong, s"$name manifest says $rows, file has $actual")
    }
  }

  test("empty partitions still commit: 8 tasks over 3 keys -> 8 files") {
    val t = freshDir()
    import s.implicits._
    Seq((1L, "O", 10.00, "1-URGENT"), (2L, "F", 20.00, "2-HIGH"), (3L, "O", 30.00, "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .repartition(8, col("o_orderkey"))
      .write.format("graft.sources.FixedWidthV2").option("path", t).mode("append").save()
    val fw = new java.io.File(t).listFiles().count(_.getName.endsWith(".fw"))
    assert(fw == 8, s"expected 8 committed files (empty ones included), got $fw")
    assert(manifest(t).find(_.startsWith("TOTAL ")).get.split(" ")(1).toLong == 3L)
  }

  test("overwrite truncates prior data atomically") {
    val t = freshDir()
    writeSlice(t, 10, 3, "append")
    writeSlice(t, 20, 2, "overwrite")
    val files = new java.io.File(t).listFiles().map(_.getName).filter(_.endsWith(".fw"))
    assert(files.length == 2, s"stale files survived truncate: ${files.mkString(", ")}")
    val total = manifest(t).find(_.startsWith("TOTAL ")).get.split(" ")(1).toLong
    val expected = graft.Tables.orders(s, TestSpark.sf)
      .filter(col("o_orderkey") % 20 === 0).count()
    assert(total == expected)
  }

  test("read-back parse reproduces the written slice row-for-row") {
    val t = freshDir()
    writeSlice(t, 10, 3, "append")
    val back = s.read.text(s"$t/part-*.fw")
      .select(
        trim(substring(col("value"), 1, 12)).cast("bigint").as("k"),
        trim(substring(col("value"), 13, 4)).as("st"),
        substring(col("value"), 17, 16).cast("double").as("pr"),
        trim(substring(col("value"), 33, 16)).as("pri"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val orig = graft.Tables.orders(s, TestSpark.sf)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(back == orig)
  }

  test("streaming epoch commit is idempotent: a replayed epoch publishes nothing new") {
    val t = freshDir()
    val conf = s.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(t).getFileSystem(conf)
    def stageTask(pid: Int, task: Long): FixedWidthV2.FwCommitMessage = {
      val w = new FixedWidthV2.FwWriter(t, pid, task, conf, epochTag = "000007-")
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        pid.toLong, org.apache.spark.unsafe.types.UTF8String.fromString("O"),
        12.34, org.apache.spark.unsafe.types.UTF8String.fromString("1-URGENT")))
      w.commit().asInstanceOf[FixedWidthV2.FwCommitMessage]
    }
    val sw = new FixedWidthV2.FwStreamingWrite(t)
    sw.commit(7L, Array(stageTask(0, 100L), stageTask(1, 101L)))
    val after1 = new java.io.File(t).listFiles().map(_.getName).filter(_.endsWith(".fw")).sorted
    assert(after1.length == 2)
    // the crash-replay: same epoch re-runs its tasks (new attempt ids)
    // and re-commits — the published state must not change
    sw.commit(7L, Array(stageTask(0, 200L), stageTask(1, 201L)))
    val after2 = new java.io.File(t).listFiles().map(_.getName).filter(_.endsWith(".fw")).sorted
    assert(after2.sameElements(after1), s"epoch replay duplicated data: ${after2.mkString(", ")}")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t, "_temporary/part-000007-0-200.fw")),
      "replayed attempt's temp file not cleaned up")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t, "_MANIFEST-000007")))
  }

  test("oversized field fails the task, aborts the job, and leaves no committed data") {
    val t = freshDir()
    import s.implicits._
    val bad = Seq((1L, "TOOLONGSTATUS", 10.0, "1-URGENT"))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    intercept[Exception] {
      bad.write.format("graft.sources.FixedWidthV2").option("path", t).mode("append").save()
    }
    val dir = new java.io.File(t)
    val committed = Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.endsWith(".fw") || n == "_MANIFEST")
    assert(committed.isEmpty, s"aborted write left visible data: ${committed.mkString(", ")}")
  }
}
