package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap top-k aggregate's contract: partitioning-invariant
  * (merge is set-union + trim), buffers never exceed k entries, ties
  * rank deterministically, and the plan combines map-side. */
class TopKPairsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(parts: Int): Seq[(Long, Int, Long)] =
    Tables.events(s, sf)
      .repartition(parts, col("event_id")) // NOT the grouping key: forces real merges
      .groupBy(col("user_id"))
      .agg(expr("topk_pairs(value, event_id, 3)").as("tk"))
      .select(col("user_id"), posexplode(col("tk")))
      .select(col("user_id"), col("pos").cast("int"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("result is invariant under partitioning (1-way vs 32-way)") {
    assert(run(1) == run(32))
  }

  test("unit semantics: eviction, rank order, tie-break toward greater id") {
    val agg = TopKPairs(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = true), k = 2)
    val buf = agg.createAggregationBuffer()
    val rows = Seq((1.0, 10L), (5.0, 20L), (5.0, 30L), (2.0, 40L))
    rows.foreach { case (v, id) =>
      agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(v, id)): Unit
    }
    assert(buf.size == 2, "buffer must stay capped at k")
    // k largest of {(1,10),(5,20),(5,30),(2,40)} = {(5,30),(5,20)}; rank
    // order descending: (5.0,30) first — equal values break to greater id
    val out = agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val first = out.get(0, agg.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(first.getDouble(0) == 5.0 && first.getLong(1) == 30L)
    // serialize/deserialize round-trips the capped buffer
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == 2 && agg.serialize(buf).length == 32)
  }

  test("plan combines map-side: partial aggregate present, no window or global sort of input") {
    val df = Tables.events(s, sf)
      .groupBy(col("user_id"))
      .agg(expr("topk_pairs(value, event_id, 3)").as("tk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"typed imperative aggregate must plan as an aggregate:\n$plan")
    assert(!plan.contains("Window"), "the aggregate form must not fall back to a window")
  }
}
