package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap TOP-K as a native typed imperative aggregate — the O(k)
  * scale path for per-key top-k next to the window formulation
  * (`r_topk_perkey`): `row_number() OVER (ORDER BY …) <= k` must SHUFFLE
  * AND SORT every row of every key before discarding all but k, while
  * this aggregate keeps a k-capped ordered buffer per key, combines
  * map-side (partial buffers are O(k), so the shuffle carries k rows per
  * key per map task, not the key's full row set), and merges by
  * set-union + trim. At 100 TB with hot keys the difference is the
  * key's row count vs k.
  *
  * Keeps the k LARGEST (value, id) pairs under lexicographic order —
  * ties on value break toward the greater id, making the result a pure
  * function of the input SET (dedup by construction: (value, id) pairs
  * repeat only if rows duplicate ids). Result is an array of
  * struct<value, id> in rank order (descending), ready for posexplode
  * into (rank, id, value) rows. */
case class TopKPairs(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, "topk_pairs: k must be positive")

  override def children: Seq[Expression] = valueExpr :: idExpr :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${v.sql}, ${i.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "topk_pairs"

  // scala.math.Ordering.Tuple2(TotalOrdering, Long): deterministic for
  // every double bit pattern (NaN ordered last, -0.0 < 0.0)
  private implicit val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def add(buf: java.util.TreeSet[(Double, Long)], p: (Double, Long)): Unit = {
    buf.add(p)
    if (buf.size > k) buf.pollFirst(): Unit // evict the smallest
  }

  override def update(
      buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      add(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // rank order: largest first
    var i = 0
    while (it.hasNext) {
      val (v, id) = it.next()
      out(i) = InternalRow(v, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (v, id) = it.next()
      bb.putDouble(v); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add((bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
}
