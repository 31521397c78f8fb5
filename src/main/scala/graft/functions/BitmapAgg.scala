package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BitwiseAnd, BitwiseOr, Cast, CreateArray, EqualTo, Expression, If, IsNull, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fixed-width BITMAP-OR aggregate as a native Catalyst
  * DECLARATIVE aggregate — the fourth custom-aggregate machinery class
  * in the stack, and deliberately a different one from the three
  * `TypedImperativeAggregate`s (KMV, bottom-k, top-k pairs): a
  * declarative aggregate has NO opaque buffer object at all — its state
  * is `nbits/64` plain LONG buffer slots and its update/merge/evaluate
  * are ordinary Catalyst expressions (shift/mask/or), so the whole
  * aggregation stays inside Tungsten's UnsafeRow fixed-width layout and
  * whole-stage codegen, with zero serialization anywhere. That is the
  * right machinery for a Bloom/bitmap build: each input row sets one
  * bit, partial bitmaps OR together map-side (commutative, idempotent —
  * re-ORing a bit is free, so speculative re-execution is harmless),
  * and the shuffle carries exactly `nbits/8` bytes per group whatever
  * the row count.
  *
  * `bitmap_agg(pos, nbits)` → array<long> of length nbits/64 with bit
  * `pos` set for every non-null input position (callers guarantee
  * 0 ≤ pos < nbits; out-of-range behavior is masked — pos % nbits —
  * rather than an executor-side crash, matching pmod-derived inputs).
  * Consumed by the portable-Bloom family (`k_portable_bloom_join`),
  * where the aggregate's single output row IS the broadcastable filter. */
case class BitmapAgg(
    child: Expression,
    nbits: Int)
  extends DeclarativeAggregate {

  require(nbits > 0 && nbits % 64 == 0 && nbits <= 65536,
    s"bitmap_agg: nbits must be a positive multiple of 64 (≤ 65536), got $nbits")

  private val nWords = nbits / 64

  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral bit position, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "bitmap_agg"

  private lazy val words: Seq[AttributeReference] =
    (0 until nWords).map(i => AttributeReference(s"w$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = words

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(nWords)(Literal(0L))

  // pos masked into range, then split into (word, bit) by shift/mask —
  // every term a plain codegen'd integer expression
  private lazy val posL: Expression = Cast(child, LongType)
  private lazy val masked: Expression =
    org.apache.spark.sql.catalyst.expressions.Pmod(posL, Literal(nbits.toLong))
  private lazy val wordIdx: Expression = ShiftRight(masked, Literal(6))
  private lazy val bitMask: Expression =
    ShiftLeft(Literal(1L), Cast(BitwiseAnd(masked, Literal(63L)), IntegerType))

  override lazy val updateExpressions: Seq[Expression] =
    words.zipWithIndex.map { case (w, i) =>
      If(IsNull(child), w,
        If(EqualTo(wordIdx, Literal(i.toLong)), BitwiseOr(w, bitMask), w))
    }

  override lazy val mergeExpressions: Seq[Expression] =
    words.map(w => BitwiseOr(w.left, w.right))

  override lazy val evaluateExpression: Expression = CreateArray(words)
}
