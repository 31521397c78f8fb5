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

  test("multimodal e2e: gates reject, dedup keeps lowest id, shard ordinals dense") {
    val rows = Media.pipelineE2e(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    // every surviving pair passed the gates
    rows.foreach { case (_, _, _, w, h, tok) =>
      assert(w >= 4 && w * 2 >= h && tok >= 8 && tok <= 200)
    }
    // the width gate genuinely rejects on this fixture (ids with
    // id%11 in {0,1} decode at width 2 or 3)
    val nImages = Media.jpegDecode(s, sf).count()
    assert(rows.length < nImages, "no image was ever rejected")
    // per-shard ordinals are a dense 1..n sequence
    rows.groupBy(_._1).foreach { case (shard, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length),
        s"shard $shard ordinals not dense")
    }
  }

  test("patchify: full-patch fan-out; sums conserve on even-dimension images") {
    val s = graft.TestSpark.spark
    val rows = Media.patchify(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val byImg = rows.groupBy(_._1)
    byImg.foreach { case (id, g) =>
      val (w, h) = ((id % 13).toInt + 2, (id % 7).toInt + 2)
      assert(g.length == (w / 2) * (h / 2), s"img $id: ${g.length} patches")
      assert(g.map(_._2).sorted.toSeq == (0 until g.length), s"img $id: idx not dense")
    }
    // on an even-by-even image the patches tile exactly: channel sums
    // conserve against the whole-image decode
    val whole = Media.ppmDecode(s, graft.TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val even = byImg.keys.filter(id => (id % 13) % 2 == 0 && (id % 7) % 2 == 0)
    assert(even.nonEmpty, "fixture has no even-dimension image")
    even.foreach { id =>
      val g = byImg(id)
      assert((g.map(_._3).sum, g.map(_._4).sum, g.map(_._5).sum) == whole(id),
        s"img $id: patch sums do not conserve")
    }
  }

  test("keyframes: frame 0 always keyed; adaptive rule splits moving frames") {
    val s = graft.TestSpark.spark
    val rows = Media.keyframes(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.filter(_._2 == 0).foreach { case (id, _, diff, key) =>
      assert(key == 1 && diff == 0L, s"clip $id frame 0: diff=$diff key=$key")
    }
    val moving = rows.filter(_._2 > 0)
    assert(moving.forall(_._3 > 0), "a moving frame with zero pixel change")
    // the adaptive threshold genuinely splits: both classes exist overall
    assert(moving.exists(_._4 == 1) && moving.exists(_._4 == 0),
      "keyframe rule degenerate: all moving frames on one side")
  }

  test("audio features: window fan-out, bounds, and an independent per-clip recompute") {
    val s = graft.TestSpark.spark
    val rows = Media.audioFeatures(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every clip fans out to exactly frames/16 windows
    val winCount = rows.groupBy(_._1).view.mapValues(_.length).toMap
    winCount.foreach { case (id, n) =>
      assert(n == ((id % 50).toInt + 20) / 16, s"clip $id: $n windows")
    }
    // feature bounds: ZCR < window, peak ≤ 2^15, energy ≤ 16·2^30
    rows.foreach { case (id, w, energy, zc, peak) =>
      assert(zc >= 0 && zc < 16 && peak <= 32768 && energy <= 16L * 32768 * 32768,
        s"clip $id win $w out of bounds: e=$energy zc=$zc p=$peak")
    }
    // independent recompute of one clip from the generator formula
    val id = rows.head._1
    val ch = 1 + (id % 2).toInt
    def v(f: Long): Long = ((id * 7 + f * ch * 13) % 65536) - 32768
    rows.filter(_._1 == id).foreach { case (_, w, energy, zc, peak) =>
      val fs = (w * 16L until w * 16L + 16).map(v)
      assert(energy == fs.map(x => x * x).sum)
      assert(zc == fs.sliding(2).count(p => p(0) * p(1) < 0))
      assert(peak == fs.map(math.abs).max)
    }
  }
}
