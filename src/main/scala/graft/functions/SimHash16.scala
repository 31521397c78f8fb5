package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native 16-bit SimHash: `array<string>` (distinct) words → `int`.
  * Per-word 16-bit value = the first 4 hex chars of the word's md5
  * (i.e. the first two digest bytes, big-endian); simhash bit j (MSB
  * first) is set iff a strict majority of words have bit j set —
  * EXACTLY the semantics of the declarative formulation this replaces
  * in operators.Dedup.simhash (and of its DuckDB oracle).
  *
  * The declarative form was the repo's known interpreted-HOF trap in
  * its worst shape: `transform(sequence(0,15), j -> aggregate(hvs, ...))`
  * is 16 nested interpreted folds per document — per (word × bit) lambda
  * dispatch — stacked on a per-word `conv(substring(md5(...)))` string
  * chain. It was the one slope-gate flag in BENCH_r05 (18.3× time at
  * 10× rows). This expression is one tight JVM loop per row: md5 each
  * word once, accumulate all 16 bit-counts from the two leading digest
  * bytes, take the majority — the same shape as
  * [[MinHashSignature]], whose CodegenFallback rationale applies
  * verbatim (long internal loop, per-row dispatch negligible).
  *
  * Null handling mirrors the declarative form: a null ELEMENT
  * contributes no set bits but still counts in the majority denominator
  * (`size(hvs)` counted nulls); a null ARRAY yields null (UnaryExpression
  * null-intolerance = `aggregate(null, ...)`).
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val counts = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        md.reset()
        val digest = md.digest(ws.getUTF8String(i).getBytes)
        // first 4 lowercase-hex chars of md5 == first two digest bytes
        val h = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
        var j = 0
        while (j < 16) {
          if ((h & (1 << (15 - j))) != 0) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sim = 0
    var j = 0
    while (j < 16) {
      if (counts(j) * 2 > n) sim |= 1 << (15 - j)
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def apply(words: Column): Column =
    GraftInterop.column(new SimHash16(GraftInterop.expression(words)))
}
