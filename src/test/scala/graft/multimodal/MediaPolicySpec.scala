package graft.multimodal

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The cross-modality media dedup policy (`m_policy_e2e`): ledger
  * coverage, the lower-id-witness verdict rule, and the planted
  * re-upload leg (exactness vs DuckDB is the Verify gate's job). */
class MediaPolicySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("ledger covers every media item once; all three verdicts live; witness rule sound") {
    val rows = Media.mediaPolicy(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    val universe =
      Media.dhashImageTable(s, sf).collect().map(p => ("image", p._1)) ++
        Media.mirrorImageTable(s, sf).collect().map(p => ("image", p._1)) ++
        Media.audioFpTable(s, sf).collect().map(p => ("audio", p._1)) ++
        Media.videoFpTable(s, sf).collect().map(p => ("video", p._1))
    assert(rows.map(r => (r._1, r._2)).toSet == universe.toSet &&
      rows.length == universe.length, "ledger ≠ media universe")
    assert(rows.map(_._7).toSet == Set("keep", "drop", "review"),
      s"degenerate fixture: only ${rows.map(_._7).toSet} present")
    rows.foreach { case (mod, id, nExact, nNear, minHam, witness, verdict) =>
      verdict match {
        case "keep" =>
          assert(witness == id, s"$mod/$id kept with foreign witness $witness")
        case "drop" =>
          assert(witness < id && nExact >= 1, s"$mod/$id dropped without exact evidence")
        case "review" =>
          assert(witness < id && nNear >= 1 && minHam >= 0,
            s"$mod/$id reviewed without near-dup evidence")
      }
    }
    // every planted re-upload drops against its base; the base keeps
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    universe.collect { case ("image", id) if id >= Media.MirrorOffset => id }.foreach { mid =>
      val m = byKey(("image", mid))
      assert(m._7 == "drop" && m._6 == mid - Media.MirrorOffset,
        s"mirror $mid: ${m._7} witness ${m._6}")
      assert(byKey(("image", mid - Media.MirrorOffset))._7 == "keep",
        s"mirror base ${mid - Media.MirrorOffset} not kept")
    }
  }
}
