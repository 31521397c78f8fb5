package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The catalog time-travel contract: `VERSION AS OF` pins the manifest,
  * plain reads resolve the latest version, a nonexistent version fails
  * at the manifest (never silently reads another snapshot), and
  * TIMESTAMP AS OF is rejected explicitly. */
class CatalogTimeTravelSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private lazy val cat: String = {
    val base = graft.TempPaths.scratch(s, "ttspec")
    import org.apache.spark.sql.functions._
    def writeDir(name: String, keys: Seq[Long]): String = {
      import s.implicits._
      keys.map(k => s"$k\t${k * 100}").toDF("value")
        .coalesce(1).write.mode("overwrite").text(s"$base/data/$name")
      s"$base/data/$name"
    }
    val fA = writeDir("A", Seq(1L, 2L))
    val fB = writeDir("B", Seq(3L))
    val fC = writeDir("C", Seq(3L, 4L))
    def commit(v: Int, files: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$base/manifest-v$v.txt"),
        files.mkString("\n").getBytes("UTF-8")): Unit
    commit(1, Seq(fA, fB))
    commit(2, Seq(fA, fC))
    val c = "gttspec" + base.replaceAll("[^A-Za-z0-9]", "_")
    s.conf.set(s"spark.sql.catalog.$c", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$c.tt_path", base)
    s.range(1).count() // force lazy init ordering stability
    c
  }

  private def keys(sql: String): Seq[Long] =
    s.sql(sql).collect().map(_.getLong(0)).sorted.toSeq

  test("VERSION AS OF pins each snapshot; plain read resolves latest") {
    assert(keys(s"SELECT o_orderkey FROM $cat.orders_tt VERSION AS OF 1") ==
      Seq(1L, 2L, 3L))
    assert(keys(s"SELECT o_orderkey FROM $cat.orders_tt VERSION AS OF 2") ==
      Seq(1L, 2L, 3L, 4L))
    assert(keys(s"SELECT o_orderkey FROM $cat.orders_tt") ==
      Seq(1L, 2L, 3L, 4L), "un-travelled read must resolve the latest manifest")
  }

  test("price_cents rides through the line format exactly") {
    val total = s.sql(
      s"SELECT SUM(price_cents) AS t FROM $cat.orders_tt VERSION AS OF 1")
      .collect().head.getLong(0)
    assert(total == (1L + 2L + 3L) * 100)
  }

  test("a nonexistent version fails at the manifest") {
    val e = intercept[Exception] {
      s.sql(s"SELECT * FROM $cat.orders_tt VERSION AS OF 9").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("version 9") || m.contains("manifest-v9")),
      s"failure must name the missing manifest, got: ${msgs(e)}")
  }

  test("TIMESTAMP AS OF without a timestamp record is rejected, not misread") {
    val e = intercept[Exception] {
      s.sql(s"SELECT * FROM $cat.orders_tt TIMESTAMP AS OF '2026-01-01'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("VERSION AS OF")),
      s"rejection must point at VERSION AS OF, got: ${msgs(e)}")
  }

  test("TIMESTAMP AS OF: at-or-before rule, boundary inclusive, pre-history fails") {
    val base = s.conf.getOption(s"spark.sql.catalog.$cat.tt_path").get
    VersionedLinesV2.writeTimestamps(base, Seq(1 -> 1000L, 2 -> 2000L))
    try {
      def keysAt(sec: Long): Seq[Long] =
        keys(s"SELECT o_orderkey FROM $cat.orders_tt TIMESTAMP AS OF CAST($sec AS TIMESTAMP)")
      assert(keysAt(1500L) == Seq(1L, 2L, 3L), "between commits → v1")
      assert(keysAt(1000L) == Seq(1L, 2L, 3L), "boundary is at-or-before (inclusive)")
      assert(keysAt(2000L) == Seq(1L, 2L, 3L, 4L), "second boundary → v2")
      val e = intercept[Exception] { keysAt(500L) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("precedes the first commit")),
        s"pre-history must fail, got: ${msgs(e)}")
    } finally {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$base/_timestamps.tsv")): Unit
    }
  }
}
