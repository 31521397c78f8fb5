package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Forward as-of contract, checked against a brute-force recompute: a
  * match is the MINIMAL eligible purchase (at-or-after in (us, id)
  * order, inside tolerance), a NULL really has none, and both outcomes
  * occur on the fixture. */
class AsofForwardSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf
  private val Tol = 3600L * 1000000L

  test("matches are minimal eligible purchases; NULLs have none") {
    val events = graft.Tables.events(s, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases: Map[Long, Seq[(Long, Long)]] = events.filter(_._3 == "purchase")
      .groupBy(_._1).map { case (k, v) => k -> v.map(e => (e._4, e._2)).toSeq.sorted }
    val got = Events.queries("e_asof_forward")(s, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (if (r.isNullAt(3)) None else Some(r.getLong(3)),
         if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    var matched = 0; var unmatched = 0
    events.filter(_._3 == "click").foreach { case (u, cid, _, cus) =>
      val eligible = purchases.getOrElse(u, Seq.empty[(Long, Long)])
        .filter { case (pus, pid) =>
          (pus > cus || (pus == cus && pid > cid)) && pus - cus <= Tol
        }
      val expect = eligible.sorted.headOption
      val (gid, gwait) = got((u, cid))
      expect match {
        case Some((pus, pid)) =>
          matched += 1
          assert(gid.contains(pid) && gwait.contains(pus - cus),
            s"click $cid of user $u: got ($gid, $gwait), want ($pid, ${pus - cus})")
        case None =>
          unmatched += 1
          assert(gid.isEmpty && gwait.isEmpty,
            s"click $cid of user $u matched $gid with nothing eligible")
      }
    }
    assert(matched > 0 && unmatched > 0,
      s"fixture must exercise both outcomes ($matched matched, $unmatched not)")
  }
}
