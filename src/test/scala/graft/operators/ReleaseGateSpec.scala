package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The corpus release-gate flagship (`t_release_gate`): funnel
  * conservation and stage liveness (exactness vs DuckDB is the Verify
  * gate's job). */
class ReleaseGateSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("per-source funnel conserves docs; every stage is live on the fixture") {
    val rows = Pipeline.releaseGate(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // conservation: in = suppressed + dedup-dropped + released, per source
    rows.foreach { case (src, nIn, sup, dd, rel, _, _) =>
      assert(nIn == sup + dd + rel, s"$src leaks docs: $nIn != $sup+$dd+$rel")
    }
    // the card covers the whole corpus exactly once
    assert(rows.map(_._2).sum == Tables.documents(s, sf).count())
    // each gate must actually fire somewhere, and something must ship
    assert(rows.map(_._3).sum > 0, "k-anonymity gate never suppressed")
    assert(rows.map(_._4).sum > 0, "dedup policy never withheld a doc")
    assert(rows.map(_._5).sum > 0, "nothing released")
    assert(rows.map(_._6).sum > 0, "PII redaction never fired on released docs")
    // published token volume only counts released docs
    rows.filter(_._5 == 0).foreach { r =>
      assert(r._6 == 0 && r._7 == 0, s"${r._1}: tokens/pii without released docs")
    }
  }

  test("release verdicts agree with the standalone stage operators") {
    import org.apache.spark.sql.functions._
    val anon = CorpusClean.kAnonymity(s, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getString(5)).toMap
    val pol = Dedup.policyE2e(s, sf).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    val docs = Tables.documents(s, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")).collect()
    val expected = docs.groupBy(_.getString(2)).view.mapValues { g =>
      g.map { r =>
        val a = anon((r.getString(1), r.getString(2), r.getLong(3) / 100))
        if (a == "suppress") "sup"
        else if (pol(r.getLong(0)) != "keep") "dd"
        else "rel"
      }
    }.toMap
    val got = Pipeline.releaseGate(s, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    expected.foreach { case (src, vs) =>
      val e = (vs.count(_ == "sup").toLong, vs.count(_ == "dd").toLong,
        vs.count(_ == "rel").toLong)
      assert(got(src) == e, s"$src: ledger ${got(src)} vs replay $e")
    }
  }
}
