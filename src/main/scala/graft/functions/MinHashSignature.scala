package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `array<string>` shingles → `array<long>` of
  * `numPerms` Carter-Wegman minima. Permutation i of a shingle is
  * `(a + i·b) mod prime`, where (a, b) are the first two 32-bit words of
  * the shingle's md5 — EXACTLY the semantics of the declarative
  * formulation in operators.Dedup (and its DuckDB oracle), which this
  * expression replaces on the hot path: the higher-order-function version
  * pays interpreted lambda dispatch per element (numPerms × shingles per
  * row); this is one tight JVM loop per row.
  *
  * CodegenFallback is deliberate: the row-level work is a long internal
  * loop, so per-row dispatch overhead is negligible and custom doGenCode
  * would buy little (unlike the per-value CosineSimilarity case).
  */
case class MinHashSignature(child: Expression, numPerms: Int, prime: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var hashed = 0
    var i = 0
    while (i < n) {
      // null elements contribute nothing (containsNull arrays are legal
      // input, e.g. from a user transform); an all-null array yields the
      // same all-null signature as an empty one
      if (!shingles.isNullAt(i)) {
        hashed += 1
        md.reset()
        val digest = md.digest(shingles.getUTF8String(i).getBytes)
        // first two big-endian 32-bit words of the digest == parsing the
        // first 16 lowercase-hex chars in two 8-char chunks (Dedup oracle)
        val a = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        val b = ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
          ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
        var p = 0
        while (p < numPerms) {
          val v = (a + p * b) % prime
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (hashed == 0) new GenericArrayData(Array.fill[Any](numPerms)(null))
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** SQL-registration defaults — match operators.Dedup's LSH parameters. */
  val DefaultNumPerms: Int = 16
  /** Largest prime < 2^32 (Carter-Wegman modulus). */
  val DefaultPrime: Long = 4294967291L

  def apply(shingles: Column, numPerms: Int, prime: Long): Column =
    GraftInterop.column(new MinHashSignature(
      GraftInterop.expression(shingles), numPerms, prime))
}
