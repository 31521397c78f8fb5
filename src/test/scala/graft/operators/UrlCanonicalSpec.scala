package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Canonicalization contract: every canonical form is fully normalized
  * (no uppercase, no www, no query, no trailing slash), every frontier
  * URL lands in exactly one group, and the variance axes really
  * collapse (duplicates exist by construction). */
class UrlCanonicalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("canonical forms normalized; coverage and collapse hold") {
    val rows = CorpusClean.urlCanonical(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, _, _, _) =>
      assert(u.matches("^https://[a-z0-9.]+\\.example\\.com/docs/[0-9]+$"),
        s"not canonical: $u")
    }
    val total = graft.Tables.documents(s, sf).count()
    assert(rows.map(_._2).sum == total, "every URL lands in exactly one group")
    assert(rows.exists(_._2 > 1), "planted duplicates must collapse")
    rows.foreach { case (_, _, nDocs, keeper) =>
      assert(nDocs >= 1 && keeper >= 0)
    }
  }
}
