package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must be bit-identical to the interpreted
  * higher-order-function fold it replaces — same IEEE ops, same order —
  * or oracle hashes would drift. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def foldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("native expression == HOF fold, bit-for-bit, on real embeddings") {
    val e = Tables.embeddings(s, sf)
    val q = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val both = e.crossJoin(broadcast(q))
      .select(
        GraftFunctions.cosine_sim(col("embedding"), col("q_emb")).as("native"),
        foldCosine(col("embedding"), col("q_emb")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("cosine_similarity is registered as a SQL function via extensions") {
    Tables.embeddings(s, sf).limit(3).createOrReplaceTempView("emb_ext_test")
    val rows = s.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM emb_ext_test")
      .collect().map(_.getDouble(0))
    assert(rows.length == 3)
    rows.foreach(c => assert(math.abs(c - 1.0) < 1e-15))
  }

  test("self-similarity is exactly 1.0 for unit work") {
    val e = Tables.embeddings(s, sf).limit(10)
    val selfs = e.select(
      GraftFunctions.cosine_sim(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    // dot/(sqrt(n)*sqrt(n)) may differ from 1.0 only by sqrt rounding
    selfs.foreach(c => assert(math.abs(c - 1.0) < 1e-15))
  }
}
