package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** The tagged-union carry-forward as-of join must equal the obvious
  * specification: for each left row, the right row with the greatest
  * `us` at-or-before it (ties to the left row's timestamp included),
  * null when none exists. Random keys/timestamps, duplicate left
  * timestamps included. Without `uniqueKey`, tied right rows are
  * unspecified, so the base property dedups right (key, us); the
  * uniqueKey properties keep the duplicates and assert the pin. */
object AsofJoinPropertySpec extends Properties("AsofJoinProperty") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val s = TestSpark.spark

  private val sideGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, for {
      key <- Gen.chooseNum(0L, 4L)
      us <- Gen.chooseNum(-100L, 100L)
    } yield (key, us))
  } yield rows

  property("asofJoinTables == greatest at-or-before right row per left row") =
    Prop.forAll(sideGen, sideGen) { (leftRows, rightRowsRaw) =>
      import s.implicits._
      // dedup right (key, us) — the documented uniqueness contract
      val rightRows = rightRowsRaw.distinct
      val left = leftRows.zipWithIndex
        .map { case ((k, us), id) => (k, us, id.toLong) }
        .toDF("key", "us", "left_id")
      val right = rightRows.zipWithIndex
        .map { case ((k, us), id) => (k, us, id.toLong) }
        .toDF("key", "us", "right_id")

      val got = Events.asofJoinTables(left, right, Seq("right_id"))
        .select("left_id", "asof_right_id")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      val rightByKey = rightRows.zipWithIndex.groupBy(_._1._1)
      val expected = leftRows.zipWithIndex.map { case ((k, us), id) =>
        val best = rightByKey.getOrElse(k, Nil)
          .filter(_._1._2 <= us)
          .sortBy(_._1._2)
          .lastOption.map(_._2.toLong)
        (id.toLong, best)
      }.toMap

      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  property("uniqueKey pins duplicate (key, us) right rows to the greatest key") =
    Prop.forAll(sideGen, sideGen) { (leftRows, rightRows) =>
      import s.implicits._
      // NO dedup: keys 0..4 × us -100..100 over ≤30 rows collide often —
      // exactly the tied-right-rows case the uniqueKey parameter pins
      val left = leftRows.zipWithIndex
        .map { case ((k, us), id) => (k, us, id.toLong) }
        .toDF("key", "us", "left_id")
      val right = rightRows.zipWithIndex
        .map { case ((k, us), id) => (k, us, id.toLong) }
        .toDF("key", "us", "right_id")

      val got = Events.asofJoinTables(left, right, Seq("right_id"),
          uniqueKey = Some("right_id"))
        .select("left_id", "asof_right_id")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      val rightByKey = rightRows.zipWithIndex.groupBy(_._1._1)
      val expected = leftRows.zipWithIndex.map { case ((k, us), id) =>
        // greatest us at-or-before, ties broken by greatest right_id
        val best = rightByKey.getOrElse(k, Nil)
          .filter(_._1._2 <= us)
          .sortBy(r => (r._1._2, r._2))
          .lastOption.map(_._2.toLong)
        (id.toLong, best)
      }.toMap

      Prop(got == expected) :| s"got=$got expected=$expected"
    }

  // tied right rows must be carried wholesale: the pinned row's null
  // field stays null even when the OTHER tied row has a value there
  property("uniqueKey pins the whole row, null fields included") = {
    import s.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("key", "us", "left_id")
    val right = Seq(
      (1L, 10L, 3L, Some(7.0)),
      (1L, 10L, 5L, Option.empty[Double]))
      .toDF("key", "us", "right_id", "click_value")
    val row = Events.asofJoinTables(left, right, Seq("right_id", "click_value"),
        uniqueKey = Some("right_id"))
      .select("asof_right_id", "asof_click_value").collect().head
    Prop(row.getLong(0) == 5L && row.isNullAt(1)) :| s"got $row, want (5, null)"
  }

  // regression: carry columns must move as ONE row — carrying each column
  // independently with ignoreNulls would fill a null field from an OLDER
  // right row, fabricating a row that never existed
  property("null carry fields stay with their row, not filled from older rows") = {
    import s.implicits._
    val left = Seq((1L, 12L, 100L)).toDF("key", "us", "left_id")
    val right = Seq(
      (1L, 5L, Some(4L), Some(3.0)),
      (1L, 10L, Some(7L), Option.empty[Double]))
      .toDF("key", "us", "click_id", "click_value")
    val row = Events.asofJoinTables(left, right, Seq("click_id", "click_value"))
      .select("asof_click_id", "asof_click_value").collect().head
    Prop(row.getLong(0) == 7L && row.isNullAt(1)) :| s"got $row, want (7, null)"
  }
}
