package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The integer-DCT contract: the scaled basis keeps the transform's
  * structure — row 0 is the DC row (every entry 4096), every higher
  * row is orthogonal to DC up to the floor rounding (|Σ| ≤ N), and the
  * engine's k=0 coefficient equals 4096 × the window's sample sum
  * recomputed from the generator formula. */
class MfccSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("basis: DC row exact, higher rows orthogonal to DC within rounding") {
    assert(Media.dctTable(0).forall(_ == 4096L), "C(0,n) must be 4096")
    (1 until 8).foreach { k =>
      val sum = Media.dctTable(k).sum
      assert(math.abs(sum) <= 16, s"row $k sums to $sum — not a cosine row")
    }
  }

  test("k=0 coefficient equals 4096 x the window sum from the generator") {
    val rows = Media.mfcc(s, sf).collect()
      .filter(_.getInt(2) == 0)
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((id, win), coeff) =>
      val ch = 1 + (id % 2).toInt
      val expect = (0 until 16).map { n =>
        ((id * 7 + (win * 16 + n).toLong * ch * 13) % 65536) - 32768
      }.sum * 4096L
      assert(coeff == expect, s"media $id win $win: $coeff vs $expect")
    }
  }
}
