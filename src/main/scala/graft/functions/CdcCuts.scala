package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking cut points of a string, as a native
  * codegen'd expression — the Catalyst twin of the flatMap kernel in
  * `operators/CorpusClean.cdcChunks` (the X2 extract-holdings
  * discipline: one semantics, two execution forms, same oracle). The
  * rolling window hash h(p) = Σ char(p+k)·31^(7−k) is a tight integer
  * loop over the decoded string; cut positions (1-based window starts
  * p ≥ 2 with h(p) % 64 == 0) come back as `array<int>`, so chunk
  * assembly stays in builtins (arrays_zip + posexplode + substring)
  * and the whole stage keeps codegen. */
case class CdcCuts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcCuts.cuts($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  val Window = 8
  val Mask = 64L // expected chunk ≈ 64 chars
  /** 31^7 .. 31^0 — max 8·0xFFFF·31^7 stays far inside Long. */
  val Pow: Array[Long] = Array.iterate(1L, Window)(_ * 31).reverse

  /** Shared by eval and codegen (and re-derived independently by the
    * SQL oracle): one pass, one bounded int buffer per row. String
    * decode gives java.lang.String charAt semantics — identical to the
    * flatMap kernel's, and to SQL substr for the BMP text the corpus
    * carries. */
  def cuts(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val buf = new scala.collection.mutable.ArrayBuffer[Any]()
    var p = 2
    while (p <= n - Window + 1) {
      var h = 0L
      var k = 0
      while (k < Window) { h += str.charAt(p - 1 + k).toLong * Pow(k); k += 1 }
      if (h % Mask == 0L) buf += p
      p += 1
    }
    new GenericArrayData(buf.toArray)
  }
}
