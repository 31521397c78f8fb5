package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties, Prop}

/** The property that makes the sketch oracle-checkable: its state is a
  * pure function of the input MULTISET — any partitioning of the input
  * into partial buffers, merged in any order, yields identical contents
  * (selected values AND their exact counts). Plus the degradation and
  * estimation contracts the queries rely on. */
class BottomKCountsSpec extends AnyFunSuite {
  private lazy val s = graft.TestSpark.spark

  private def sketchOf(values: Seq[Long], k: Int, splits: Int): Seq[(Long, Long, Long)] = {
    val agg = BottomKCounts(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), k)
    // partition the multiset, build one partial buffer per slice (in
    // slice order), then merge the partials in REVERSE — a merge tree a
    // real shuffle would never produce in this order
    val slices = values.grouped(math.max(1, (values.size + splits - 1) / splits)).toSeq
    val partials = slices.map { sl =>
      val b = agg.createAggregationBuffer()
      sl.foreach(v => agg.update(b, org.apache.spark.sql.catalyst.InternalRow(v)))
      b
    }
    val merged = partials.reverse.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val arr = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  test("merge-order independence: 1, 3, and 17-way partitionings agree exactly") {
    val rnd = new scala.util.Random(11)
    val values = Seq.fill(5000)(rnd.nextInt(400).toLong - 200L)
    val one = sketchOf(values, 32, 1)
    assert(sketchOf(values, 32, 3) == one)
    assert(sketchOf(values, 32, 17) == one)
    assert(sketchOf(rnd.shuffle(values), 32, 5) == one,
      "input order leaked into the sketch state")
  }

  test("survivor counts are EXACT occurrence counts of the multiset") {
    val rnd = new scala.util.Random(3)
    val values = Seq.fill(2000)(rnd.nextInt(50).toLong)
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    sketchOf(values, 16, 7).foreach { case (_, v, cnt) =>
      assert(cnt == exact(v), s"value $v count $cnt != exact ${exact(v)}")
    }
  }

  test("fewer than k distinct values: the sketch IS the exact histogram") {
    val values = Seq.tabulate(300)(i => (i % 10).toLong)
    val sk = sketchOf(values, 64, 4)
    assert(sk.size == 10)
    assert(sk.map(_._2).toSet == (0L until 10L).toSet)
    sk.foreach { case (_, _, cnt) => assert(cnt == 30L) }
  }

  test("SQL registration: bottomk_counts groups match a window-function recompute") {
    import s.implicits._
    val df = (0 until 1000).map(i => ("g" + (i % 2), (i * i % 97).toLong)).toDF("g", "v")
    df.createOrReplaceTempView("bk_probe")
    val got = s.sql(
      """SELECT g, e.v AS v, e.cnt AS cnt
        |FROM (SELECT g, bottomk_counts(v, 8) AS sk FROM bk_probe GROUP BY g)
        |LATERAL VIEW explode(sk) t AS e
        |ORDER BY g, e.h, e.v""".stripMargin).collect()
    assert(got.length == 16)
    val exact = (0 until 1000).map(i => ("g" + (i % 2), (i * i % 97).toLong))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach(r => assert(r.getLong(2) == exact((r.getString(0), r.getLong(1)))))
  }

  test("median estimate from the sample tracks the exact weighted median") {
    // a skewed multiset: the estimator must land within the central mass
    val rnd = new scala.util.Random(19)
    val values = Seq.fill(20000)(math.abs(rnd.nextGaussian() * 100).toLong)
    val sorted = values.sorted
    val exactMedian = sorted((sorted.size - 1) / 2)
    val sk = sketchOf(values, 64, 9).sortBy(_._2)
    val tot = sk.map(_._3).sum
    var run = 0L
    val est = sk.find { case (_, _, c) => run += c; run * 2 >= tot }.get._2
    val spread = sorted((sorted.size * 3) / 4) - sorted(sorted.size / 4)
    assert(math.abs(est - exactMedian) <= spread,
      s"estimate $est vs exact $exactMedian off by more than the IQR $spread")
  }
}

/** ScalaCheck form of the merge-order invariant over random multisets,
  * split counts, and k. */
object BottomKCountsProperty extends Properties("BottomKCounts") {
  private def sketch(values: List[Long], k: Int, splits: Int): Seq[(Long, Long, Long)] = {
    val agg = BottomKCounts(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true), k)
    val slices =
      if (values.isEmpty) Seq(Nil)
      else values.grouped(math.max(1, (values.size + splits - 1) / splits)).toSeq
    val partials = slices.map { sl =>
      val b = agg.createAggregationBuffer()
      sl.foreach(v => agg.update(b, org.apache.spark.sql.catalyst.InternalRow(v)))
      b
    }
    val merged = partials.reverse.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val arr = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  property("state is a pure function of the multiset") =
    Prop.forAll(
      Gen.listOf(Gen.chooseNum(-100L, 100L)),
      Gen.chooseNum(1, 20),
      Gen.chooseNum(1, 9),
      Gen.chooseNum(2, 9)) { (vs, k, s1, s2) =>
      sketch(vs, k, s1) == sketch(vs, k, s2)
    }
}
