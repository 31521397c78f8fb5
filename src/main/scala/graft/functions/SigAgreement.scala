package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native MinHash-signature agreement count: two `array<long>` signatures
  * → the number of positions where both values are non-null and equal.
  * Replaces the declarative
  * `aggregate(zip_with(sa, sb, (x,y) -> if(x=y,1,0)), 0, (acc,v) -> acc+v)`
  * scorer on the dedup hot path — the HOF form pays interpreted lambda
  * dispatch per signature element per candidate pair (the round-5
  * d_simhash lesson), this is one tight JVM loop per pair. Semantics are
  * EXACTLY the zip_with form's: a null on either side contributes 0
  * (null = null is not true), a null signature array yields null (the
  * pair drops at the threshold filter), and length mismatch counts only
  * the shared prefix (zip_with pads with nulls, which contribute 0).
  * Estimated Jaccard = agreement / numPerms stays a single IEEE divide of
  * an exact integer, so oracle hashes are unchanged.
  *
  * CodegenFallback is deliberate (the MinHashSignature precedent): the
  * per-row work is an internal loop over numPerms elements, so per-row
  * dispatch overhead is already amortized.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[ArrayData]
    val sb = b.asInstanceOf[ArrayData]
    val n = math.min(sa.numElements(), sb.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!sa.isNullAt(i) && !sb.isNullAt(i) && sa.getLong(i) == sb.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def apply(a: Column, b: Column): Column =
    GraftInterop.column(new SigAgreement(
      GraftInterop.expression(a), GraftInterop.expression(b)))
}
