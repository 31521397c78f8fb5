package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The cross-modal release board (`t_release_board`): funnel
  * conservation per cell, corpus coverage per modality, and agreement
  * with the two flagship verdict sources it composes (exactness vs
  * DuckDB is the Verify gate's job). */
class ReleaseBoardSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val rows = Pipeline.releaseBoard(s, sf).collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))

  // collected once: mediaPolicy runs all three codec-decoding near-dup
  // arms — two tests replay against it, so they share one execution
  private lazy val policyRows = graft.multimodal.Media.mediaPolicy(s, sf).collect()

  test("every (source, modality) cell partitions its items into the four buckets") {
    assert(rows.nonEmpty)
    rows.foreach { case (src, mod, nIn, pb, dd, rv, rl) =>
      assert(nIn == pb + dd + rv + rl,
        s"($src, $mod) leaks items: $nIn != $pb+$dd+$rv+$rl")
    }
    val mods = rows.map(_._2).toSet
    assert(mods == Set("text", "image", "audio", "video"),
      s"modalities on the board: $mods")
    // privacy ladder exists for text only; media rows must report 0
    rows.filter(_._2 != "text").foreach { r =>
      assert(r._4 == 0, s"(${r._1}, ${r._2}) claims privacy suppressions")
    }
    assert(rows.filter(_._2 == "text").map(_._4).sum > 0,
      "k-anonymity never suppressed a text doc")
    // every funnel class fires somewhere, and something ships per modality
    assert(rows.map(_._5).sum > 0, "dedup never dropped")
    assert(rows.map(_._6).sum > 0, "nothing held for review")
    mods.foreach { m =>
      assert(rows.filter(_._2 == m).map(_._7).sum > 0, s"$m released nothing")
    }
  }

  test("text cells cover the corpus once; media cells cover the media universe once") {
    assert(rows.filter(_._2 == "text").map(_._3).sum ==
      Tables.documents(s, sf).count())
    val mediaCounts = rows.filter(_._2 != "text").groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap
    val policyCounts = policyRows
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    assert(mediaCounts == policyCounts,
      s"board media counts $mediaCounts vs policy ledger $policyCounts")
  }

  test("board verdict rollup agrees with the composed flagships") {
    import org.apache.spark.sql.functions._
    // text leg replayed from the standalone operators
    val anon = CorpusClean.kAnonymity(s, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getString(5)).toMap
    val pol = Dedup.policyE2e(s, sf).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")).collect()
    val srcOf = docs.map(r => r.getLong(0) -> r.getString(2)).toMap
    val expectedText = docs.groupBy(_.getString(2)).view.mapValues { g =>
      val vs = g.map { r =>
        val a = anon((r.getString(1), r.getString(2), r.getLong(3) / 100))
        if (a == "suppress") "pb" else pol(r.getLong(0))
      }
      (vs.count(_ == "pb").toLong, vs.count(_ == "drop").toLong,
        vs.count(_ == "review").toLong, vs.count(_ == "keep").toLong)
    }.toMap
    val gotText = rows.filter(_._2 == "text")
      .map(r => r._1 -> ((r._4, r._5, r._6, r._7))).toMap
    assert(gotText == expectedText)
    // media leg replayed from the policy ledger + the id→source mapping
    val off = graft.multimodal.Media.MirrorOffset
    val expectedMedia = policyRows
      .map { r =>
        val id = r.getLong(1)
        (srcOf(if (id >= off) id - off else id), r.getString(0), r.getString(6))
      }
      .groupBy(t => (t._1, t._2)).view.mapValues { g =>
        (g.count(_._3 == "drop").toLong, g.count(_._3 == "review").toLong,
          g.count(_._3 == "keep").toLong)
      }.toMap
    val gotMedia = rows.filter(_._2 != "text")
      .map(r => (r._1, r._2) -> ((r._5, r._6, r._7))).toMap
    assert(gotMedia == expectedMedia)
  }
}
