package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Containment-join contract: the prefix-filtered result equals a brute
  * force over all shingle-sharing ordered pairs (completeness of the
  * directional prefix filter), the plan stays equi-join-shaped (no
  * cartesian), and the operator finds asymmetric pairs whose symmetric
  * Jaccard is below the near-dup gate — the class it exists to catch. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def bruteForce(): Set[(Long, Long, Long, Long, Long)] = {
    val ws = graft.Tables.documents(s, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), size(col("w")) - 5),
        i => array_join(slice(col("w"), i + lit(1), lit(5)), " "))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    (for {
      (a, sa) <- ws.toSeq; (b, sb) <- ws.toSeq
      if a != b && sa.nonEmpty
      inter = (sa & sb).size.toLong
      if inter * 10 >= sa.size.toLong * 9
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter)).toSet
  }

  test("prefix-filtered containment equals brute force over all ordered pairs") {
    val got = Dedup.containmentJoin(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val expected = bruteForce()
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty, "fixture must contain containment pairs")
  }

  test("finds asymmetric pairs below the symmetric near-dup Jaccard gate") {
    import s.implicits._
    // a short document quoted whole inside a much longer one: Jaccard is
    // ~|short|/|long| (far below any near-dup gate) but containment = 1 —
    // the class this operator exists to catch and the fixture's
    // similar-length near-dups don't contain
    val short = (1 to 12).map(i => s"w$i").mkString(" ")
    val long = ((1 to 12) ++ (100 to 200)).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, (300 to 340).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Dedup.containmentJoinOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.exists { case (src, dst, _, _, _) => src == 1L && dst == 2L },
      s"short-in-long containment missed: ${rows.mkString(", ")}")
    val hit = rows.find { case (src, dst, _, _, _) => src == 1L && dst == 2L }.get
    val (_, _, nSrc, nDst, inter) = hit
    assert(inter == nSrc, "full containment must intersect every src shingle")
    assert(inter * 2 < nSrc + nDst - inter,
      "the pair is symmetric-Jaccard-visible — fixture not asymmetric enough")
    assert(!rows.exists { case (src, dst, _, _, _) => src == 3L || dst == 3L },
      "the unrelated document leaked into the containment set")
  }

  test("plan is equi-join shaped: no cartesian product, no BNLJ") {
    val plan = Dedup.containmentJoin(s, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"containment join fell back to an all-pairs plan:\n$plan")
  }
}
