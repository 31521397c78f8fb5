package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: typed binary schema, batch-shaped decode,
  * frame-sampling fan-out shape. */
class MediaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("JPEG decode: real interchange bytes, exact dims, error inside the budget") {
    val rows = Media.jpegDecode(s, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) == 1), "a decoded channel sum left the error budget")
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 11).toInt + 2 && r.getInt(2) == (id % 5).toInt + 2,
        s"JPEG $id decoded to wrong dimensions")
    }
    // the payload really is an interchange JPEG (SOI marker), not a stub
    val bytes = Media.jpegTable(s, sf).head()._2
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing JPEG SOI marker")
  }

  test("media table carries binary payload + typed metadata") {
    val t = Media.mediaTable(s, sf)
    val sch = t.schema
    assert(sch("bytes").dataType.typeName == "binary")
    assert(sch("width").dataType.typeName == "integer")
    assert(t.count() > 0)
  }

  test("decode stub is deterministic and type-tagged") {
    val f = Media.mediaFeatures(s, sf).cache()
    // video: n_frames = bytes/256 + 1; other types: always 1
    assert(f.filter(col("media_type") === "video")
      .filter(col("n_frames") =!= (col("n_bytes") / 256).cast("int") + 1).count() == 0)
    assert(f.filter(col("media_type") =!= "video").filter(col("n_frames") =!= 1).count() == 0)
    // md5 matches Spark's own expression-level md5 of the same bytes
    val mismatches = f.join(
      graft.Tables.documents(s, sf).select(col("doc_id").as("media_id"),
        md5(col("text").cast("binary")).as("expected_md5")),
      "media_id")
      .filter(col("content_md5") =!= col("expected_md5")).count()
    assert(mismatches == 0)
    f.unpersist()
  }

  test("resize stub yields fixed-size output for any input size") {
    val small = MediaRecord(1L, "image", Array.tabulate(10)(_.toByte), 8, 8)
    val large = MediaRecord(2L, "image", Array.tabulate(10000)(_.toByte), 8, 8)
    assert(MediaStub.resize(small, 8, 8).length == 64)
    assert(MediaStub.resize(large, 8, 8).length == 64)
    // deterministic: same input → same output
    assert(MediaStub.resize(large, 8, 8).toSeq == MediaStub.resize(large, 8, 8).toSeq)
  }

  test("frame sampling fans one record out to ceil(chunks/stride) rows") {
    val rec = MediaRecord(7L, "video", Array.tabulate(100)(_.toByte), 32, 32)
    val frames = MediaStub.sampleFrames(rec, stride = 2)
    // 100 bytes → 7 chunks of ≤16 → indices 0,2,4,6 kept
    assert(frames.map(_._2) == Seq(0, 2, 4, 6))
    assert(frames.forall(_._1 == 7L))
  }
}
