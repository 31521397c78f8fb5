package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The streaming as-of contract: the keyed-state stream must equal the
  * batch carry-forward-window as-of join row-for-row, including ties and
  * never-clicked purchases, and must do so ACROSS micro-batch boundaries
  * (the replay feeds four event-time-ordered chunks, so most purchases
  * read a click from state written in an earlier batch). */
class AsofStreamSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("streamed as-of enrich equals the batch as-of join row-for-row") {
    val stream = Streams.streamAsofReplay(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    val batch = graft.operators.Events.asofTwoTable(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(stream == batch, s"stream ${stream.size} rows vs batch ${batch.size}")
    assert(stream.exists(_._4.isEmpty), "fixture must contain never-clicked purchases")
    assert(stream.exists(_._4.nonEmpty), "fixture must contain enriched purchases")
  }
}
