package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 3-D HILBERT curve index (Skilling's transpose algorithm, "Programming
  * the Hilbert curve", AIP 2004) — the >2-dimension clustering key next
  * to the 2-D Morton interleave in operators/Layout.scala. Morton
  * generalizes to n dims trivially but its locality degrades: adjacent
  * Z-values can jump across the whole space at bit boundaries, and with
  * 3+ interleaved keys the per-file bounding boxes stretch. The Hilbert
  * curve is the locality-optimal total order — every consecutive index
  * pair is UNIT distance in axis space (HilbertSpec proves it
  * exhaustively), so range-partitioning by it yields tighter per-file
  * rectangles on all three columns at once.
  *
  * Inputs are three longs already masked to `bits` (the caller clamps);
  * output is the 3·bits-bit Hilbert index. Evaluation and codegen both
  * route through one static `encode` — a fixed 3×bits-step integer loop,
  * no allocation beyond a 3-slot array, inlined into the surrounding
  * WholeStageCodegen stage at stage-build time (queries never touch it:
  * the layout discipline of operators/Layout.scala). */
case class HilbertIndex3(first: Expression, second: Expression, third: Expression,
    bits: Int) extends TernaryExpression {

  require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three bigint arguments, got " +
        Seq(first, second, third).map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index3"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    HilbertIndex3.encode(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) =>
      s"graft.functions.HilbertIndex3.encode($x, $y, $z, $bits)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex3 {
  /** Axes → Hilbert index: Skilling's AxesToTranspose (the in-place
    * Gray-code undo walk from the top bit down), then the standard
    * bit-transpose interleave of the three coordinates. Deterministic
    * pure integer arithmetic — identical on every JVM. */
  def encode(xi: Long, yi: Long, zi: Long, bits: Int): Long = {
    val x = new Array[Long](3)
    x(0) = xi; x(1) = yi; x(2) = zi
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    x(1) ^= x(0); x(2) ^= x(1)
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(2) & q) != 0) t ^= q - 1
      q >>= 1
    }
    x(0) ^= t; x(1) ^= t; x(2) ^= t
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < 3) {
        h = (h << 1) | ((x(i) >> b) & 1L)
        i += 1
      }
      b -= 1
    }
    h
  }
}
