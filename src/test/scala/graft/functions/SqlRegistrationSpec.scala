package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registrations for the round-7 additions: `int8_quantize` and
  * `srp_band_keys` must be callable from plain SQL and agree exactly with
  * their Column-API forms (the extension path a pure-SQL user exercises). */
class SqlRegistrationSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private lazy val sf = TestSpark.sf

  test("SQL int8_quantize == Column-API Int8Quantize on real embeddings") {
    graft.Tables.embeddings(s, sf).createOrReplaceTempView("emb_sqlreg")
    val viaSql = s.sql(
      "SELECT vec_id, int8_quantize(embedding) AS q FROM emb_sqlreg ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val viaApi = graft.Tables.embeddings(s, sf)
      .select(col("vec_id"), Int8Quantize(col("embedding")).as("q"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(viaSql.length > 0)
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("SQL srp_band_keys == Column-API SrpBandKeys with the standard planes") {
    graft.Tables.embeddings(s, sf).createOrReplaceTempView("emb_sqlreg2")
    val viaSql = s.sql(
      "SELECT vec_id, srp_band_keys(embedding, 4) AS b FROM emb_sqlreg2 ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val viaApi = graft.Tables.embeddings(s, sf)
      .select(col("vec_id"),
        SrpBandKeys(col("embedding"), SrpBandKeys.mdHyperplanes(16, 64), 4).as("b"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(viaSql.length > 0)
    assert(viaSql.toSeq == viaApi.toSeq)
  }
}
