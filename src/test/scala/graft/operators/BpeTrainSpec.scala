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

  test("t_bpe_apply equals an independent in-memory tokenizer over the same merges") {
    import org.apache.spark.sql.functions._
    // word → (count per doc) and the corpus-level counts the trainer sees
    val docWords = graft.Tables.documents(s, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 12)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docWords.groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
    // replay the reference loop, tracking each word's symbol string
    var syms = corpus.keys.map(w => w -> (" " + w.mkString(" ") + " ")).toMap
    val merges = referenceMerges(corpus, 4)
    merges.foreach { case (l, r, _) =>
      val pat = s" $l $r "
      val rep = s" $l$r "
      syms = syms.map { case (w, s0) => (w, s0.replace(pat, rep).replace(pat, rep)) }
    }
    val tokLen = syms.map { case (w, s0) => w -> s0.trim.split(" ").length.toLong }
    val expected = docWords.groupBy(_._1).map { case (doc, ws) =>
      (doc,
        ws.length.toLong,
        ws.iterator.map(_._2.length.toLong).sum,
        ws.iterator.map(w => tokLen(w._2)).sum)
    }.toSeq.sorted
    val got = BpeTrain.bpeApply(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"apply diverged: got ${got.take(3)}… exp ${expected.take(3)}…")
    // trained tokens genuinely compress: fewer tokens than characters,
    // at least as many as words
    got.foreach { case (doc, nw, nc, nt) =>
      assert(nt <= nc && nt >= nw, s"doc $doc: words=$nw chars=$nc tokens=$nt")
    }
    assert(got.map(_._4).sum < got.map(_._3).sum)
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

  test("bpe curve: char baseline, monotone compression, vocab grows by at most 1") {
    val pts = BpeTrain.bpeCurve(s, TestSpark.sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(pts.map(_._1).toSeq == (0 to 4))
    // k=0 bills characters: equals the corpus char count of eligible words
    val chars = graft.Tables.documents(s, TestSpark.sf)
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("w rlike '^[a-z]+$' AND length(w) <= 12")
      .selectExpr("sum(length(w))").head().getLong(0)
    assert(pts.head._2 == chars, s"char baseline ${pts.head._2} != $chars")
    // each merge can only shrink the bill and add at most one symbol
    pts.sliding(2).foreach { case Array((_, t1, v1), (k, t2, v2)) =>
      assert(t2 < t1, s"merge $k did not compress: $t1 -> $t2")
      assert(v2 <= v1 + 1, s"merge $k added ${v2 - v1} symbols")
    }
  }

  test("wordpiece greedy walk: longest match wins, single-char fallback") {
    val v2 = Set("bc", "lo")
    val v3 = Set("abc", "hel")
    // abcabc → abc|abc (3 beats the bc-at-offset-1 2-gram)
    assert(BpeTrain.wpTokenCount("abcabc", v2, v3) == 2)
    // hello → hel|lo (3 then 2)
    assert(BpeTrain.wpTokenCount("hello", v2, v3) == 2)
    // xyz → x|y|z (nothing matches — all singles)
    assert(BpeTrain.wpTokenCount("xyz", v2, v3) == 3)
    // abcd → abc|d (greedy leaves the orphan)
    assert(BpeTrain.wpTokenCount("abcd", v2, v3) == 2)
  }

  test("wordpiece compresses the fixture: tokens strictly under chars") {
    val rows = BpeTrain.wordpiece(s, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val (chars, toks) = rows.foldLeft((0L, 0L)) { case ((c, t), r) =>
      (c + r.getLong(2), t + r.getLong(3))
    }
    assert(toks < chars, s"no compression: $toks tokens vs $chars chars")
    assert(toks >= chars / 3, "tokens cannot beat the 3-gram floor")
  }
}
