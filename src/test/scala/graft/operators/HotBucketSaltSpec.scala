package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hot-bucket salting dial inside [[Dedup.candidatePairsFrom]]: the
  * d_band_stats pair-volume forecast fed back into the candidate join.
  * The test corpora never trip the threshold (max bucket ≈ 3), so the
  * salted plan is proven here on a synthetic bands frame with one
  * planted hot bucket — output must be PAIR-IDENTICAL to the naive
  * unsalted self-join, and the hot bucket's work must actually spread
  * across salt keys.
  */
class HotBucketSaltSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def syntheticBands = {
    import s.implicits._
    // one hot bucket (60 docs share (0, "HOT")), a warm bucket of 5, and
    // a tail of singletons; docs 0..4 also collide in a second band so
    // the distinct() dedup across bands stays exercised
    val hot = (0L until 60L).map(id => (id, 0, "HOT"))
    val warm = (100L until 105L).map(id => (id, 1, "WARM"))
    val second = (0L until 5L).map(id => (id, 2, "ALSO"))
    val tail = (200L until 220L).map(id => (id, 3, s"T$id"))
    (hot ++ warm ++ second ++ tail).toDF("doc_id", "band", "bkey")
  }

  private def naivePairs(b: org.apache.spark.sql.DataFrame) =
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

  test("salted candidate join ≡ naive self-join when the hot path fires") {
    val b = syntheticBands
    val expected = naivePairs(b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // threshold 8: the 60-doc bucket salts, the 5-doc buckets do not
    val got = Dedup.candidatePairsFrom(b, hotRows = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty && got == expected,
      s"salted join diverges: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // sanity: the hot bucket alone contributes 60*59/2 pairs
    assert(expected.size >= 60 * 59 / 2)
  }

  test("cold corpus: no bucket hot → same pairs as the naive join (default threshold)") {
    val b = syntheticBands
    val expected = naivePairs(b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.candidatePairsFrom(b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("salting actually spreads a hot bucket across salt keys") {
    import s.implicits._
    val b = syntheticBands
    // replicate the operator's right-side salt assignment: the 60 hot
    // docs must land on >1 salt key, or the reducer skew is untouched
    val salts = b.filter(col("bkey") === "HOT")
      .select(pmod(xxhash64(col("doc_id")), lit(Dedup.HotBucketSalts.toLong)).cast("int"))
      .as[Int].collect().toSet
    assert(salts.size > 4, s"hot bucket hashed to only $salts — salting is a no-op")
  }
}
