package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint escape hatch for iterative CC: `reliableDir`
  * swaps every per-round `localCheckpoint` (executor-local, lost with an
  * executor) for a real `checkpoint(dir)` (cluster runs that must survive
  * executor loss). The pin strategy must be invisible in the RESULT —
  * asserted row-for-row — and the reliable run must actually write
  * checkpoint data into the directory. */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("reliable checkpoint CC is row-identical to localCheckpoint CC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val local = Dedup.dupClusters(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val reliable = Dedup.dupClustersWith(s, sf, Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(local == reliable, "pin strategy changed the CC result")
    val written = Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
    assert(written.nonEmpty, s"reliable run wrote no checkpoint data under $dir")
  }

  test("two-phase CC accepts a custom pin and converges to the same labels") {
    import org.apache.spark.sql.functions.col
    val pairs = Dedup.neardupPairs(s, sf).select(col("a"), col("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cc2_ckpt").toString
    s.sparkContext.setCheckpointDir(dir)
    val viaLocal = Dedup.ccTwoPhase(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaReliable = Dedup.ccTwoPhase(pairs, pin = _.checkpoint())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLocal == viaReliable, "two-phase CC labels diverge across pin strategies")
  }
}
