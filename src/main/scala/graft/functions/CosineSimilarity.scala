package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two float vectors.
  *
  * Exists because the composable formulation —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — runs INTERPRETED: Spark's
  * higher-order functions don't participate in whole-stage codegen, and
  * each element evaluation pays lambda-dispatch overhead (the dominant
  * cost in the similarity/near-dup queries at sf0.1). This expression
  * generates a tight primitive loop inside the surrounding
  * WholeStageCodegen stage instead.
  *
  * Semantics are BIT-IDENTICAL to the fold form (and to the DuckDB oracle
  * mirror): each accumulator sums `(double)a[i] * (double)b[i]` in index
  * order — same IEEE operations in the same order, so hash-compared
  * results are unchanged (CosineSimilaritySpec asserts this equivalence).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API facade for the engine's custom expressions. */
object GraftFunctions {
  /** Cosine similarity of two `array<float>` columns (codegen'd). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftInterop.column(CosineSimilarity(
      GraftInterop.expression(a), GraftInterop.expression(b)))

  /** Int8 scalar quantization of an `array<float>` column (per-vector
    * max-abs scale, 127 levels; see [[Int8Quantize]]). */
  def int8_quantize(v: Column): Column = Int8Quantize(v)

  /** Bloom-filter build over a pre-hashed LONG column (pair with
    * `xxhash64`): aggregates to ONE binary value — the serialized filter.
    * Spark's own runtime-filter aggregate
    * (catalyst.expressions.aggregate.BloomFilterAggregate), reused as a
    * first-class operator; bit-OR accumulation is order-independent, so
    * the filter bytes are deterministic for a given input set. */
  def bloom_agg(hashed: Column, expectedItems: Long): Column =
    GraftInterop.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftInterop.expression(hashed), expectedItems).toAggregateExpression())

  /** 3-D Hilbert curve index of three bigint columns, `bits` per
    * dimension (codegen'd; see [[HilbertIndex3]]). Inputs must already
    * be masked to `bits`. */
  def hilbert_index3(x: Column, y: Column, z: Column, bits: Int): Column =
    GraftInterop.column(HilbertIndex3(
      GraftInterop.expression(x), GraftInterop.expression(y),
      GraftInterop.expression(z), bits))

  /** CDC cut positions of a string column (codegen'd; see [[CdcCuts]]). */
  def cdc_cuts(text: Column): Column =
    GraftInterop.column(CdcCuts(GraftInterop.expression(text)))

  /** Membership probe against a serialized bloom filter (a foldable
    * binary — `lit(bytes)`), over the same `xxhash64` hashing as
    * [[bloom_agg]]. May return false positives, never false negatives:
    * callers that need exactness confirm survivors with an exact join. */
  def bloom_might_contain(bloom: Column, hashed: Column): Column =
    GraftInterop.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftInterop.expression(bloom), GraftInterop.expression(hashed)))
}
