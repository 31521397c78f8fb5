package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** The tagged-union carry-forward as-of join must equal the obvious
  * specification: for each left row, the right row with the greatest
  * `us` at-or-before it (ties to the left row's timestamp included),
  * null when none exists. Random keys/timestamps, duplicate left
  * timestamps included; right timestamps are deduplicated per key (the
  * documented contract — tied right rows are unspecified). */
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
