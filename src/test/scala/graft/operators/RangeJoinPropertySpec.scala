package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Bucketization is a join STRATEGY, not a semantics change: for any
  * bucket width — wider, narrower, or coprime to the interval widths —
  * [[Events.intervalJoin]] must return exactly the naive
  * cross-join-BETWEEN result. Negative timestamps included (integer `div`
  * truncates toward zero but stays monotone, which is all losslessness
  * needs). */
object RangeJoinPropertySpec extends Properties("RangeJoinProperty") {

  // few-but-meaningful cases: each is a full Spark job
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val s = TestSpark.spark

  private val pointGen: Gen[List[Long]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-500L, 500L)))

  private val intervalGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      for {
        start <- Gen.chooseNum(-500L, 500L)
        width <- Gen.chooseNum(0L, 300L)
      } yield (start, start + width)))

  private val widthGen: Gen[Long] = Gen.chooseNum(1L, 400L)

  property("intervalJoin == naive BETWEEN join for any bucket width") =
    Prop.forAll(pointGen, intervalGen, widthGen) { (pts, ivs, w) =>
      import s.implicits._
      val points = pts.zipWithIndex.map { case (us, id) => (id.toLong, us) }
        .toDF("point_id", "us")
      val intervals = ivs.zipWithIndex.map { case ((a, b), id) => (id.toLong, a, b) }
        .toDF("interval_id", "start_us", "end_us")

      val bucketized = Events.intervalJoin(points, intervals, w)
        .select("interval_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val naive = intervals.crossJoin(points)
        .filter($"us" >= $"start_us" && $"us" <= $"end_us")
        .select("interval_id", "point_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      Prop(bucketized == naive) :| s"width=$w diff=${bucketized diff naive} / ${naive diff bucketized}"
    }
}
