package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE training contract on the fixture: the learned merges are genuine
  * argmax pairs (checked against an independent in-memory reimplementation
  * of the count/argmax/rewrite loop), monotonically non-increasing in
  * count, and composed of symbols that exist at their step. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  /** Independent reference: plain Scala maps, no Spark, no SQL — the same
    * determinized loop (two-pass literal replace, (n desc, l, r) ties). */
  private def referenceMerges(words: Map[String, Long], steps: Int): Seq[(String, String, Long)] = {
    var syms = words.map { case (w, c) => (" " + w.mkString(" ") + " ", c) }
    (1 to steps).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s0, c) =>
        val parts = s0.trim.split(" ")
        (0 until parts.length - 1).foreach { i =>
          counts((parts(i), parts(i + 1))) = counts.getOrElse((parts(i), parts(i + 1)), 0L) + c
        }
      }
      val ((l, r), n) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
      val pat = s" $l $r "
      val rep = s" $l$r "
      syms = syms.map { case (s0, c) =>
        (s0.replace(pat, rep).replace(pat, rep), c)
      }
      (l, r, n)
    }
  }

  test("learned merges equal an independent in-memory reimplementation") {
    import org.apache.spark.sql.functions._
    val words = graft.Tables.documents(s, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 12)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceMerges(words, 4)
    val got = BpeTrain.bpeTrain(s, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected, s"merge table diverged:\n got $got\n exp $expected")
  }

  test("merge counts never increase step over step") {
    val ns = BpeTrain.bpeTrain(s, sf).collect().map(_.getLong(3)).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"a later merge outweighed an earlier one: $ns — the argmax is broken")
  }

  test("later merges may consume earlier merged symbols (the composition property)") {
    val rows = BpeTrain.bpeTrain(s, sf).collect()
    // every merged symbol is nonempty lowercase and the step ids are 1..4
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
      assert((r.getString(1) + r.getString(2)).matches("[a-z]+"))
    }
  }
}
