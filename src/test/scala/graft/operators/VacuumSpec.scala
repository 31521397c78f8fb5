package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Retention contract: vacuumed history is GONE (a read of a dropped
  * version fails at the manifest, not with silent partial data), retained
  * versions read exactly, and the shared file survives — the REQUIREs
  * inside the operator plus the hash-checked aggregates carry the rest. */
class VacuumSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("dropped versions fail at the manifest; retained versions still read") {
    val rows = Formats.vacuum(s, TestSpark.sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(3, 4))
    assert(rows.forall(_.getAs[Int]("n_files_deleted") == 2))
    assert(rows.forall(_.getAs[Int]("n_manifests_deleted") == 2))
    // v4 = v3 plus the re-arrivals: strictly more rows
    assert(rows(1).getAs[Long]("n_rows") > rows(0).getAs[Long]("n_rows"))
    // the vacuumed run dir is the latest one the operator created
    val base = graft.TempPaths.scratch(s, "vacuum")
    val run = new java.io.File(base).listFiles().filter(_.getName.startsWith("run"))
      .maxBy(_.getName.stripPrefix("run").toInt).toString
    intercept[Exception](Formats.ManifestLog.read(run, 1))
    intercept[Exception](Formats.ManifestLog.read(run, 2))
    assert(Formats.ManifestLog.read(run, 3).nonEmpty)
    assert(Formats.ManifestLog.latest(run)._1 == 4)
  }
}
