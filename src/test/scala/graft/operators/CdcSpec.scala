package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The content-defined-chunking contract: chunks tile each document
  * exactly, boundaries re-synchronize after an insertion (the property
  * fixed-size chunking lacks), and the planted disclaimer's chunks
  * re-align across the documents that carry it. */
class CdcSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("chunks tile every document: contiguous starts, lengths sum to len") {
    val bad = CorpusClean.cdcChunks(s, sf)
      .withColumn("next_start",
        lead(col("start"), 1) over org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_idx"))
      .filter(col("next_start").isNotNull &&
        col("next_start") =!= col("start") + col("len"))
      .count()
    assert(bad == 0, s"$bad non-contiguous chunk boundaries")
    val firsts = CorpusClean.cdcChunks(s, sf)
      .filter(col("chunk_idx") === 0 && col("start") =!= 1).count()
    assert(firsts == 0, "every doc's first chunk must start at 1")
  }

  test("boundaries re-synchronize after a prefix insertion") {
    import s.implicits._
    val dir = graft.TempPaths.scratch(s, "cdc_shift")
    // non-repetitive: a periodic phrase has only period-many distinct
    // windows and can dodge the cut mask entirely
    val base = (0 until 160).map(i => "tok" + (i * 7919 % 1000)).mkString(" ")
    // ids 1 and 2: neither is %5==0, so no disclaimer is appended
    Seq((1L, base), (2L, "inserted prefix words here " + base))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = CorpusClean.cdcChunks(s, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(4)).toSeq).toMap
    val shared = chunks(1L).toSet.intersect(chunks(2L).toSet)
    assert(chunks(1L).size >= 3, s"fixture too short: ${chunks(1L).size} chunks")
    assert(shared.size >= chunks(1L).size - 2,
      s"only ${shared.size}/${chunks(1L).size} chunks survived the shift — " +
        "boundaries failed to re-synchronize")
  }

  test("the codegen'd expression twin is row-identical, with no object boundary") {
    val a = CorpusClean.cdcChunks(s, sf).collect().map(_.toString).toSeq
    val b = CorpusClean.cdcChunksGen(s, sf).collect().map(_.toString).toSeq
    assert(a == b, "flatMap kernel and CdcCuts expression diverged")
    val plan = CorpusClean.cdcChunksGen(s, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"),
      s"the native form must stay in the row domain:\n$plan")
  }

  test("chunk-level clean drops shared chunks and tiles intact docs exactly") {
    val rows = CorpusClean.cdcClean(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nc, nk, nd, _) =>
      assert(nk + nd == nc, s"doc $id: $nk kept + $nd dropped != $nc chunks")
    }
    assert(rows.exists(_._4 > 0), "the planted disclaimer must drop somewhere")
    // an untouched doc's reassembly is its exact input text
    val texts = graft.Tables.documents(s, sf)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val intact = rows.filter(r => r._4 == 0 && texts.contains(r._1))
    assert(intact.nonEmpty, "fixture must contain untouched docs")
    intact.foreach { case (id, _, _, _, cm) =>
      val input = if (id % 5 == 0) texts(id) + " " + CorpusClean.CdcDisclaimer else texts(id)
      assert(cm == md5hex(input), s"doc $id reassembly diverged from its input")
    }
  }

  test("the planted disclaimer re-aligns across the docs that carry it") {
    val nDisc = graft.Tables.documents(s, sf)
      .filter(col("doc_id") % 5 === 0 && length(col("text")) > 0).count()
    val top = CorpusClean.cdcDedup(s, sf)
      .agg(max(col("n_docs"))).collect().head.getLong(0)
    assert(top >= (nDisc * 8) / 10,
      s"most-shared chunk spans $top docs; expected ≈ the $nDisc disclaimer docs")
  }
}
