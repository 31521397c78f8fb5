package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: typed binary schema, batch-shaped decode,
  * frame-sampling fan-out shape. */
class MediaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("video near-dup: every planted twin found, nothing else survives the threshold") {
    val pairs = Media.videoNeardup(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twins = graft.Tables.documents(s, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(_ % 8 == 7).map(id => (id - 2, id)).toSet
    assert(twins.nonEmpty, "fixture has no planted video twins")
    assert(pairs.map(p => (p._1, p._2)).toSet == twins,
      "near-dup pairs != the planted twin set")
    pairs.foreach { case (a, b, h) =>
      assert(h <= 3, s"twin ($a,$b) outside the threshold: hamming $h")
    }
  }

  test("video fingerprint: 4 temporal bands per clip from real GIF decode") {
    val bands = Media.videoFpBands(s, sf).collect()
    val byId = bands.groupBy(_.getLong(0))
    assert(byId.nonEmpty)
    byId.foreach { case (id, rows) =>
      assert(rows.length == 4, s"clip $id has ${rows.length} bands")
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
      rows.foreach(r => assert((r.getLong(2) & ~0xfffL) == 0L,
        s"clip $id band key uses more than 12 bits"))
    }
  }

  test("audio near-dup: every planted twin found at hamming ~0, nothing else survives") {
    val pairs = Media.audioNeardup(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val twins = graft.Tables.documents(s, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).filter(_ % 8 == 3).map(id => (id - 1, id)).toSet
    assert(twins.nonEmpty, "fixture has no planted audio twins")
    assert(pairs.map(p => (p._1, p._2)).toSet == twins,
      "near-dup pairs != the planted twin set (missed twin or random-collision leak)")
    pairs.foreach { case (a, b, h) =>
      assert(h <= 4, s"twin ($a,$b) outside the threshold: hamming $h")
    }
  }

  test("audio near-dup candidates are band-blocked, never all-pairs") {
    val bands = Media.audioFpBands(s, sf).cache()
    try {
      val n = bands.select(col("id")).distinct().count()
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      assert(cand < n * (n - 1) / 8,
        s"banding did not block: $cand candidates for $n clips")
      // a clip fingerprint is exactly two 16-bit band rows
      assert(bands.count() == 2 * n)
    } finally bands.unpersist(): Unit
  }

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

  test("mixed-modality dispatch decodes every record with its own REAL codec") {
    val rows = Media.mediaFeatures(s, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    // coverage: one row per document id, typed by the id%3 rule
    val ids = graft.Tables.documents(s, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.keySet == ids, "dispatcher dropped or invented records")
    val types = Array("image", "audio", "video")
    rows.foreach { case (id, (tpe, _, _, _)) =>
      assert(tpe == types((id % 3).toInt), s"media $id typed $tpe")
    }
    // independent per-modality recompute from the generator formulas
    def check(id: Long): Unit = {
      val (tpe, nf, ns, sum) = rows(id)
      (id % 3) match {
        case 0 =>
          val w = (id % 13) + 2; val h = (id % 7) + 2
          val es = (0L until 3 * w * h).map(i => (id * 31 + i) % 256).sum
          assert((tpe, nf, ns, sum) == (("image", 1L, w * h, es)), s"image $id")
        case 1 =>
          val fr = (id % 50) + 20; val ch = 1 + (id % 2)
          val es = (0L until fr * ch).map(i => ((id * 7 + i * 13) % 65536) - 32768).sum
          assert((tpe, nf, ns, sum) == (("audio", fr, fr * ch, es)), s"audio $id")
        case _ =>
          val k = (id % 5) + 2; val w = (id % 9) + 2; val h = (id % 6) + 2
          val es = (for (f <- 0L until k; i <- 0L until w * h)
            yield (id * 13 + f * 7 + i) % 256).sum
          assert((tpe, nf, ns, sum) == (("video", k, k * w * h, es)), s"video $id")
      }
    }
    Seq(0, 1, 2).foreach(m => check(rows.keySet.filter(_ % 3 == m).min))
  }

  test("thumbnail is a fixed 8x8 grid of DECODED PNG pixels in both resample regimes") {
    val rows = Media.resizeThumbs(s, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(v => v._1 == 8 && v._2 == 8), "thumb dims not fixed")
    // the fixture spans upsampling (w < 8) and downsampling (w > 8)
    val up = rows.keySet.filter(id => (id % 11) + 2 < 8)
    val down = rows.keySet.filter(id => (id % 11) + 2 > 8)
    assert(up.nonEmpty && down.nonEmpty, "fixture must exercise both regimes")
    // independent recompute of one row per regime from the generator
    (up.headOption ++ down.headOption).foreach { id =>
      val w = ((id % 11) + 2).toInt; val h = ((id % 5) + 2).toInt
      var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
      (0 until 64).foreach { p =>
        val base = 3L * (((p / 8) * h / 8) * w + ((p % 8) * w / 8))
        val r = (id * 17 + base) % 256
        val g = (id * 17 + base + 1) % 256
        val b = (id * 17 + base + 2) % 256
        sr += r; sg += g; sb += b; ws += (p + 1) * (r + g + b)
      }
      assert(rows(id) == ((8, 8, sr, sg, sb, ws)), s"thumb $id diverges from pixels")
    }
  }

  test("frame sampling keeps exactly every 3rd DECODED frame of each clip") {
    val sampled = Media.frameSamples(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(sampled.nonEmpty)
    // the sampled rows are exactly gifFrames' rows at stride-3 indices —
    // same decoded frames, thinner policy
    val all = Media.gifFrames(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(5)))
    val expected = all.filter(_._2 % 3 == 0)
    assert(sampled.sorted.toSeq == expected.sorted.toSeq,
      "sampled frames diverge from the container walk at the sampled indices")
    // fan-out shape: ceil(nf/3) rows per clip
    sampled.groupBy(_._1).foreach { case (id, g) =>
      val nf = ((id % 5) + 2).toInt
      assert(g.length == (nf + 2) / 3, s"clip $id: ${g.length} of $nf frames sampled")
    }
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
