package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape checks for the corpus-cleaning pass (exactness
  * vs DuckDB is the Verify gate's job). */
class CorpusCleanSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("lineDedup drops shared lines, keeps untouched docs verbatim") {
    val heavy = CorpusClean.heavyLines(s, sf).collect().map(_.getString(0)).toSet
    val out = CorpusClean.lineDedup(s, sf).cache()
    val docs = graft.Tables.documents(s, sf)
      .select(col("doc_id"), col("text"))
    try {
      // some boilerplate must exist in the corpus, and it must be dropped
      assert(heavy.nonEmpty, "corpus has no shared lines — threshold never exercised")
      assert(out.filter(col("n_dropped") > 0).count() > 0)
      heavy.foreach(l => assert(!l.isEmpty))
      out.join(docs, "doc_id").collect().foreach { r =>
        val (clean, orig) = (r.getAs[String]("clean_text"), r.getAs[String]("text"))
        // independent re-implementation: segment, drop heavy, reassemble
        val segs = orig.split(" ").grouped(8).map(_.mkString(" ")).toSeq
        val expected = segs.filterNot(heavy.contains).mkString(" ")
        assert(clean == expected, s"doc ${r.get(0)}: got '$clean', expected '$expected'")
        assert(r.getAs[Int]("n_dropped") == segs.count(heavy.contains))
        if (r.getAs[Int]("n_dropped") == 0) assert(clean == orig)
      }
      // every doc is present (tombstones included)
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
  }

  test("lineDedup probe side broadcasts the heavy set — corpus lines never shuffle for the anti-join") {
    val plan = CorpusClean.lineDedup(s, sf).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"heavy-line anti-join must broadcast the tiny side:\n$plan")
  }

  test("piiRedact output carries no matchable PII; counts follow the injection rule") {
    val rows = CorpusClean.piiRedact(s, sf).collect()
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}".r
    val phone = "\\+1-555-\\d{4}".r
    rows.foreach { r =>
      val (id, clean) = (r.getLong(0), r.getAs[String]("clean_text"))
      assert(email.findFirstIn(clean).isEmpty, s"email survived in doc $id")
      assert(ip.findFirstIn(clean).isEmpty, s"ip survived in doc $id")
      assert(phone.findFirstIn(clean).isEmpty, s"phone survived in doc $id")
      val (ne, ni, np) = (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"), r.getAs[Int]("n_phones"))
      id % 3 match {
        case 0 => assert(ne == 1 && ni == 1 && np == 0, s"doc $id: ($ne,$ni,$np)")
        case 1 => assert(ne == 0 && ni == 0 && np == 1, s"doc $id: ($ne,$ni,$np)")
        case _ => assert(ne == 0 && ni == 0 && np == 0, s"doc $id: ($ne,$ni,$np)")
      }
      // redaction markers actually landed
      if (id % 3 == 0) assert(clean.contains("<EMAIL>") && clean.contains("<IP>"))
      if (id % 3 == 1) assert(clean.contains("<PHONE>"))
    }
  }

  test("mixtureSample hits the target mixture: capped sources keep everything, others thin out") {
    val docs = graft.Tables.documents(s, sf)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = perSource.values.sum
    val target = total / 2
    val sampled = CorpusClean.mixtureSample(s, sf).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def weight(src: String): Double = {
      val i = src.stripPrefix("src").toInt
      if (i < 4) 0.10 else if (i < 10) 0.06 else 0.024
    }
    perSource.foreach { case (src, n) =>
      val rate = math.min(1.0, target * weight(src) / n)
      val got = sampled.getOrElse(src, 0L)
      if (rate >= 1.0) assert(got == n, s"$src: capped source must keep all ($got of $n)")
      else {
        // md5-uniform: binomial tolerance, generous for small n
        val exp = rate * n
        assert(math.abs(got - exp) <= math.max(4.0, 4 * math.sqrt(exp)),
          s"$src: expected ≈$exp, got $got")
      }
    }
  }

  test("mixtureSample acceptance is a narrow filter — no shuffle of the corpus side") {
    val plan = CorpusClean.mixtureSample(s, sf).queryExecution.sparkPlan.toString
    // the only joins are broadcasts of the tiny rate/total aggregates
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle into the rates join:\n$plan")
  }
}
