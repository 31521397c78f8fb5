package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The image near-dup contract: band-blocked dHash matching recovers
  * EXACTLY the pairs an all-pairs Hamming scan finds at the threshold
  * (banding loses nothing on the fixture), every planted XOR-1 twin is
  * among them, and the plan is cartesian-free. */
class DhashNeardupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  /** Independent in-memory dHash from the ENCODED bytes — decode,
    * block-sum, compare; the same definition re-derived, not shared
    * code paths. */
  private def bruteHashes: Map[Long, Seq[Long]] = {
    Media.dhashImageTable(s, sf).collect().map { case (id, bytes) =>
      val img = PpmCodec.decode(bytes)
      val sum4 = Array.tabulate(8, 9) { (r, c) =>
        (for (dy <- 0 to 1; dx <- 0 to 1)
          yield img.raster(3 * ((2 * r + dy) * 18 + (2 * c + dx))) & 0xff).sum
      }
      val keys = new Array[Long](4)
      for (k <- 0 until 64)
        if (sum4(k / 8)(k % 8) > sum4(k / 8)(k % 8 + 1)) keys(k / 16) |= 1L << (k % 16)
      id -> keys.toSeq
    }.toMap
  }

  test("banded result equals the all-pairs Hamming scan at the threshold") {
    val hashes = bruteHashes
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      ham = hashes(a).zip(hashes(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if ham <= 8
    } yield (a, b, ham.toLong)).toSet
    val got = Media.dhashNeardup(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"banded=${got.size} brute=${brute.size}; banding must lose nothing here")
    assert(got.nonEmpty)
  }

  test("every planted twin with its base present is recovered, close") {
    val ids = Media.dhashImageTable(s, sf).collect().map(_._1).toSet
    val planted = ids.filter(id => id % 8 == 1 && ids.contains(id - 1))
      .map(id => (id - 1, id))
    val got = Media.dhashNeardup(s, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    planted.foreach { p =>
      assert(got.contains(p), s"planted twin $p missing")
      assert(got(p) <= 8, s"twin $p at distance ${got(p)}")
    }
    assert(planted.nonEmpty)
  }

  test("the candidate join is band-blocked, never cartesian") {
    val plan = Media.dhashNeardup(s, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"near-dup join must block on band keys:\n$plan")
  }
}
