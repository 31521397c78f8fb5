package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration + null semantics of the native MinHash expression. */
class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("minhash_signature is registered as a SQL function via extensions") {
    val rows = s.sql(
      "SELECT minhash_signature(array('a b c', 'b c d')) AS sig")
      .collect()
    assert(rows.length == 1)
    val sig = rows.head.getSeq[Long](0)
    assert(sig.length == MinHashSignature.DefaultNumPerms)
    assert(sig.forall(v => v >= 0 && v < MinHashSignature.DefaultPrime))
  }

  test("SQL form with explicit (num_perms, prime) matches the Column API") {
    import s.implicits._
    val df = Seq(Seq("x y z", "y z w"), Seq("q r s")).toDF("shingles")
    df.createOrReplaceTempView("mh_ext_test")
    val viaSql = s.sql(
      "SELECT minhash_signature(shingles, 8, 4294967291) AS sig FROM mh_ext_test")
      .collect().map(_.getSeq[Long](0).toList).toList
    val viaApi = df.select(MinHashSignature(col("shingles"), 8, 4294967291L).as("sig"))
      .collect().map(_.getSeq[Long](0).toList).toList
    assert(viaSql == viaApi)
  }

  test("null elements are skipped; all-null and empty arrays yield null signatures") {
    val rows = s.sql(
      """SELECT minhash_signature(array('a b c', CAST(NULL AS STRING))) AS withNull,
        |       minhash_signature(array('a b c')) AS without,
        |       minhash_signature(array(CAST(NULL AS STRING))) AS allNull,
        |       minhash_signature(CAST(array() AS ARRAY<STRING>)) AS empty,
        |       minhash_signature(CAST(NULL AS ARRAY<STRING>)) AS nullArr
        |""".stripMargin).collect()
    val r: Row = rows.head
    assert(r.getSeq[Any](0) == r.getSeq[Any](1), "null element must not change the signature")
    assert(r.getSeq[Any](2).forall(_ == null))
    assert(r.getSeq[Any](3).forall(_ == null))
    assert(r.isNullAt(4), "null input -> null output (nullSafeEval)")
  }
}
