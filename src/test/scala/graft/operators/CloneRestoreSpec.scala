package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Clone/restore contracts beyond the oracle: determinism across runs,
  * and the SHARED-FILE OWNERSHIP hazard — a source-side vacuum that
  * ignores clones breaks them, which is why production table formats
  * either pin cloned files or scope vacuum to reachable-from-any-clone.
  * The engine's clone is shallow by design; this spec documents the
  * rule a retention job over cloned tables must follow. */
class CloneRestoreSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("clone and restore are deterministic across runs") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(Formats.cloneTable(s, sf)) == rows(Formats.cloneTable(s, sf)))
    assert(rows(Formats.restoreTable(s, sf)) == rows(Formats.restoreTable(s, sf)))
    // the deep clone reads exactly even though its query DELETED the
    // source outright — the isolation shallow clones cannot give
    assert(rows(Formats.queries("k_deep_clone")(s, sf)) ==
      rows(Formats.queries("k_deep_clone")(s, sf)))
  }

  test("a source vacuum that ignores clones breaks the clone (the ownership rule)") {
    import s.implicits._
    val base = graft.TempPaths.scratch(s, "clone_hazard")
    Seq((1L, 100L), (2L, 200L)).toDF("k", "cents")
      .write.mode("overwrite").parquet(s"$base/data/F")
    def commit(table: String, v: Int, files: Seq[String]): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/$table"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$base/$table/manifest-v$v.txt"),
        files.mkString("\n").getBytes("UTF-8")): Unit
    }
    commit("src", 1, Seq(s"$base/data/F"))
    commit("clone", 1, Seq(s"$base/data/F")) // shallow clone shares F
    // source rewrites F into G and vacuums by ITS OWN reachability only
    Seq((1L, 100L), (2L, 200L)).toDF("k", "cents")
      .write.mode("overwrite").parquet(s"$base/data/G")
    commit("src", 2, Seq(s"$base/data/G"))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec); f.delete(): Unit
    }
    deleteRec(new java.io.File(s"$base/data/F")) // src-scoped vacuum: F unreachable from src v2
    // the source still reads; the clone is broken — exactly the hazard
    assert(s.read.parquet(s"$base/data/G").count() == 2)
    val e = intercept[Exception] {
      s.read.parquet(s"$base/data/F").count()
    }
    assert(e != null)
  }
}
