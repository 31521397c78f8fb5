package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native SRP (signed-random-projection) band keys: `array<float>` vector
  * → `array<int>` of `bands` LSH bucket keys against a literal hyperplane
  * matrix. Bit h is `Σ_j v(j)·m(h)(j) >= 0`; band b packs its
  * `rows/bands` consecutive bits little-endian.
  *
  * Two reasons this is native rather than declarative
  * (operators.Similarity keeps the HOF formulation for the
  * bit-equivalence spec):
  *   1. The fold-per-bit `aggregate(zip_with(...))` runs interpreted —
  *      16 lambda-dispatched folds per row on the ANN hot path; this is
  *      one tight JVM loop.
  *   2. Referencing a shared bits array from 16 band-key expressions
  *      re-evaluates it 16× after CollapseProject inlines the alias;
  *      emitting finished band keys keeps the expensive computation
  *      evaluated exactly once per row.
  *
  * The per-bit accumulation is the same sequential left fold (identical
  * IEEE op order) as the declarative version and the DuckDB oracle's
  * `list_reduce`, so sign decisions are bit-identical — SrpBandKeysSpec
  * asserts it on real embeddings.
  *
  * CodegenFallback is deliberate (like MinHashSignature): the row-level
  * work is a rows×dim loop, so per-row dispatch overhead is negligible.
  */
case class SrpBandKeys(child: Expression, matrix: Array[Array[Double]], bands: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && matrix.length % bands == 0,
    s"bands ($bands) must divide hyperplane count (${matrix.length})")
  private val bitsPerBand = matrix.length / bands

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "srp_band_keys"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val keys = new Array[Int](bands)
    // Bit-for-bit parity with lshBandKeysFold is the contract: there, a
    // null element OR a length mismatch (zip_with null-pads the shorter
    // side) nulls the whole dot product, and `null >= 0` fails every bit
    // test — all-zero keys. Match both cases exactly.
    if (n != matrix(0).length) return new GenericArrayData(keys)
    var j0 = 0
    while (j0 < n) {
      if (v.isNullAt(j0)) return new GenericArrayData(keys)
      j0 += 1
    }
    var h = 0
    while (h < matrix.length) {
      val row = matrix(h)
      val dim = math.min(n, row.length)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += v.getFloat(j).toDouble * row(j)
        j += 1
      }
      // Java `>=` is false for NaN, but Spark SQL and DuckDB order NaN
      // above all values, so the fold's `acc >= 0` is TRUE there — a
      // NaN dot product (NaN/Inf component) must set the bit here too.
      if (acc >= 0 || acc.isNaN) keys(h / bitsPerBand) |= 1 << (h % bitsPerBand)
      h += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
}

object SrpBandKeys {
  def apply(vector: Column, matrix: Array[Array[Double]], bands: Int): Column =
    GraftInterop.column(new SrpBandKeys(
      GraftInterop.expression(vector), matrix, bands))

  /** The engine's STANDARD md5-derived hyperplane matrix — plane (h, j) is
    * the first 8 hex chars of `md5("hp<h>_<j>")` mapped to [-1, 1). ONE
    * definition shared by the Column API user (operators.Similarity), the
    * SQL registration (GraftExtensions), and — re-derived by formula — the
    * DuckDB oracles; deterministic everywhere, no RNG, no broadcast of
    * trained state. */
  def mdHyperplanes(bits: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (h, j) =>
      md.reset()
      val hex = md.digest(s"hp${h}_$j".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
    }
  }
}
