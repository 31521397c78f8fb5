package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The drift-gate contract at small-n: the scale-free threshold keeps
  * same-distribution halves quiet even on a tiny slice (where a fixed
  * cutoff drowns in 1/n noise) while the planted encoder shift fires. */
class EmbedDriftSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("same halves stay quiet; the planted shift fires") {
    val rows = Similarity.queries("v_embed_drift")(s, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getInt(4)))).toMap
    val (sameD, sameF) = rows("same")
    val (shiftD, shiftF) = rows("shifted")
    assert(sameF == 0, s"same-distribution halves flagged drift at dist2=$sameD")
    assert(shiftF == 1, s"the planted shift must fire, dist2=$shiftD")
    assert(shiftD > sameD + 0.2, "the shift term (0.25) must dominate the gap")
  }
}
