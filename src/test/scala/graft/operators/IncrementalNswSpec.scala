package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The graph-insert contract: repeated probes never rebuild the staged
  * base graph, and the appended BACK-LINKS make freshly inserted
  * vectors retrievable — without them an append-only insert is
  * write-only storage. */
class IncrementalNswSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("probe-after-insert reuses the staged base graph") {
    val first = Similarity.queries("v_incremental_nsw")(s, sf).collect()
      .map(_.toString).toSeq
    val builds = Similarity.incNswBuildCount.get()
    val second = Similarity.queries("v_incremental_nsw")(s, sf).collect()
      .map(_.toString).toSeq
    assert(Similarity.incNswBuildCount.get() == builds,
      "second probe must reuse the staged base graph")
    assert(first == second, "probe must be deterministic")
    assert(first.nonEmpty)
  }

  test("back-links make inserted vectors retrievable") {
    val rows = Similarity.queries("v_incremental_nsw")(s, sf).collect()
      .map(r => r.getLong(2))
    assert(rows.exists(_ % 10 == 7),
      "no inserted vector surfaced — the back-link append is not load-bearing")
  }
}
