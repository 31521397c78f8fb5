package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch as a native Catalyst
  * TYPED IMPERATIVE AGGREGATE — the custom-machinery class the engine's
  * stack was missing next to expressions, generators, plans, and rules.
  *
  * Keeps the k smallest DISTINCT 32-bit hashes of the input strings,
  * where the hash is EXACTLY the engine's portable `hex8(md5(s))` (the
  * first four digest bytes, big-endian unsigned) — so unlike HLL++,
  * whose register layout is implementation-defined (`k_approx_distinct`
  * is rows-only for that reason), the KMV state is a pure function of
  * the input VALUE SET and the oracle can recompute it row-for-row in
  * SQL: sort the distinct hashes, keep k. The distinct-count estimate
  * `(k−1)·2³² / h_k` is then one deterministic double division.
  *
  * Mergeability is the scale property: partial buffers are O(k) longs,
  * map-side combine and final merge are set-union + trim, and the
  * estimate quality is tuned by k alone. The buffer is a TreeSet capped
  * at k — update/merge never hold more than k+1 entries. */
case class KmvHashes(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "kmv_hashes: k must be positive")

  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string value, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "kmv_hashes"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast(): Unit
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
      // first 8 hex chars of the digest = first 4 bytes, big-endian
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      add(buf, h)
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending: rank order
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashes =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashes =
    copy(inputAggBufferOffset = newOffset)
}
