package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native int8 quantizer vs the declarative fold it replaced, on
  * ADVERSARIAL vectors — the docstring's parity claims (NaN scale
  * ordering, floor's double→long collapse of NaN/±Inf ratios, ±0 and
  * denormal components) proven where they're subtle, not just on the
  * clean corpus (SimilaritySpec covers that). */
class Int8QuantizeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def foldForm = {
    val sc = array_max(transform(col("v"), x => abs(x.cast("double"))))
    transform(col("v"), x => floor(x.cast("double") / sc * 127).cast("float"))
  }

  test("native == declarative fold on NaN/Inf/zero/denormal vectors, bit-for-bit") {
    import s.implicits._
    val adversarial: Seq[Seq[Float]] = Seq(
      Seq(1.0f, -2.5f, 3.75f),                      // plain
      Seq(Float.NaN, 1.0f, 2.0f),                   // NaN poisons the scale
      Seq(Float.PositiveInfinity, 1.0f),            // Inf scale → ratios 0/1-ish
      Seq(Float.NegativeInfinity, 5.0f),            // |−Inf| scale
      Seq(Float.MinPositiveValue, 1e-38f),          // denormals
      Seq(-1.0f),                                   // single negative
      Seq(127.5f, -127.5f, 64.25f),                 // exact halves
      Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity),
      (1 to 64).map(i => (i * 0.13f) * (if (i % 2 == 0) -1 else 1)),
    )
    val df = adversarial.toDF("v")
    val both = df.select(
      GraftFunctions.int8_quantize(col("v")).as("native"),
      foldForm.as("fold"))
    // null-safe comparison; NaN == NaN under Spark's <=> semantics
    assert(both.filter(!(col("native") <=> col("fold"))).count() == 0,
      s"divergence:\n${both.collect().mkString("\n")}")
  }

  test("all-zero vector: native degrades to zeros where the ANSI fold would kill the job") {
    import s.implicits._
    // deliberate divergence (documented in Int8Quantize): scale 0 makes
    // the declarative form raise DIVIDE_BY_ZERO under ANSI mode — a
    // single degenerate vector failing a 100 TB job — while the native
    // form follows the 0/0→NaN→floor-to-long path to a benign zero vector
    val df = Seq(Seq(0.0f, -0.0f, 0.0f)).toDF("v")
    val out = df.select(GraftFunctions.int8_quantize(col("v")).as("q"))
      .collect().head.getSeq[Float](0)
    assert(out == Seq(0.0f, 0.0f, 0.0f))
    val ansiFold = df.select(foldForm.as("q"))
    val thrown = intercept[Throwable](ansiFold.collect())
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"), s"unexpected: $thrown")
  }

  test("null vector → null output (UnaryExpression null contract, both forms)") {
    import s.implicits._
    val df = Seq(Option.empty[Seq[Float]], Some(Seq(1.0f, 2.0f))).toDF("v")
    val out = df.select(GraftFunctions.int8_quantize(col("v")).as("q")).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
