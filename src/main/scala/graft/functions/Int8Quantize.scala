package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native int8 scalar quantization: `array<float>` → `array<float>` of
  * integer values `floor(v/scale·127)` with `scale = max(|v_i|)`.
  *
  * Exists for the CollapseProject reason (the SrpBandKeys/MinHashSignature
  * precedent, and the exact shape round 5's slope gate flagged on
  * d_simhash): the declarative form computes the scale as
  * `array_max(transform(v, abs))`, and once the alias is inlined into the
  * per-element quantize lambda, every one of the 64 output elements
  * re-evaluates the 64-element max — 64 interpreted folds per row on the
  * ANN hot path. This is one two-pass loop.
  *
  * Bit-parity contract with the declarative form (asserted element-for-
  * element in SimilaritySpec):
  *   - the max uses Spark's double ordering, where NaN sorts ABOVE all
  *     values — a NaN component poisons the scale exactly like array_max;
  *   - quantize matches Spark's `floor(double)` expression, which returns
  *     a LONG (`Math.floor(x).toLong`) — so NaN/±Inf ratios collapse to 0
  *     / ±Long extremes there, and this does the same before the float
  *     cast;
  *   - a null ELEMENT nulls the declarative scale (`transform` maps null
  *     through `abs`, `array_max` of a null-containing array is null in
  *     effect of `x/null` = null)… the corpus contract (poisoned gate)
  *     only ever nulls WHOLE vectors, which UnaryExpression null-handling
  *     covers; null elements are rejected here loudly rather than
  *     silently diverging.
  *
  * Deliberate divergence (Int8QuantizeSpec pins it): an ALL-ZERO vector
  * has scale 0, and under Spark 4's default ANSI mode the declarative
  * `x / 0.0` raises DIVIDE_BY_ZERO — one degenerate vector killing a
  * 100 TB job. The native form follows the IEEE 0/0→NaN→floor-to-long
  * path to a benign all-zero output instead (the NportKernel
  * divergence-#1 argument: per-row degradation over job death).
  */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null element at $i — null whole vectors are supported, null components are not")
      i += 1
    }
    // pass 1: scale = max(|v_i|) under Spark's double ordering (NaN above all)
    var sc = Double.NegativeInfinity
    var scIsNaN = false
    i = 0
    while (i < n && !scIsNaN) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (java.lang.Double.isNaN(a)) scIsNaN = true
      else if (a > sc) sc = a
      i += 1
    }
    if (scIsNaN) sc = Double.NaN
    // pass 2: floor(v/sc*127) with Spark Floor's double→long semantics
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble / sc * 127).toLong.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  def apply(vector: Column): Column =
    GraftInterop.column(new Int8Quantize(GraftInterop.expression(vector)))
}
