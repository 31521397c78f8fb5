package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming specs driven through MemoryStream — watermark
  * session closure and stateful streaming dedup. */
class StreamingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("dedup→enrich→window pipeline runs TWO state stores in one query and dedups before counting") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val dim = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "tier")
    val q = in.toDF().toDF("event_id", "user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("tier"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("tier"), col("n"))
      .writeStream.format("memory").queryName("pipeline_out")
      .outputMode(OutputMode.Append).start()
    try {
      // each event sent twice: the dedup stage must halve the counts.
      // Times sit off epoch zero — the initial watermark IS epoch 0 and
      // a row exactly at it reads as late.
      in.addData((1L, 1L, ts(60), 1.0), (1L, 1L, ts(60), 1.0),
        (2L, 2L, ts(65), 2.0), (2L, 2L, ts(65), 2.0))
      q.processAllAvailable()
      in.addData((99L, 1L, ts(60 * 48), 0.0)) // watermark push
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 2,
        s"expected dedup + window-agg state operators in ONE query, got ${ops.length}")
      val rows = s.table("pipeline_out").collect()
      val out = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(out == Map(10L -> 1L, 20L -> 1L),
        s"duplicates reached the aggregate: $out; raw=${rows.mkString("; ")}; " +
          s"stateOps=${q.lastProgress.stateOperators.map(o => o.operatorName + ":" + o.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }

  test("session_window closes sessions past the watermark") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val df = in.toDF().toDF("user_id", "ts", "value")
    val q = Streams.sessionAgg(df).writeStream
      .format("memory").queryName("sessions_out").outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10 min apart (one session), then a 2-day jump
      // to push the watermark far past the session end
      in.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
      q.processAllAvailable()
      in.addData((1L, ts(60 * 48), 9.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, n_events, sum_value FROM sessions_out").collect()
      assert(rows.length == 1) // first session closed; the late one still open
      assert(rows.head.getLong(1) == 2 && rows.head.getDouble(2) == 3.0)
    } finally q.stop()
  }

  test("batch and stream sessionization agree row-for-row on real events") {
    import org.apache.spark.sql.functions._
    val sf = graft.TestSpark.sf
    val streamed = Streams.sessionizeStream(s, sf)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .collect().toSeq
    val gapUs = 1800L * 1000000L
    val batch = graft.operators.Events.sessionize(s, sf)
      .select(col("user_id"), col("start_us"),
        (col("end_us") + gapUs).as("end_us"), // session_window end = last event + gap
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_us")
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming replay queries are idempotent within a session (memory sink resets)") {
    // Bench runs each replay twice (warmup + timed) in one session; an
    // accumulating sink would silently double the timed run's data
    val sf = graft.TestSpark.sf
    val n1 = Streams.sessionizeStream(s, sf).count()
    val n2 = Streams.sessionizeStream(s, sf).count()
    assert(n1 > 0 && n1 == n2, s"replay not idempotent: $n1 then $n2")
  }

  test("LSH dedup bucket state is bounded by clusters, not documents (viral-cluster)") {
    // one bucket fed a 500-document duplicate cluster plus one distinct
    // doc: state must hold 2 representatives, not 501 signatures
    val numPerms = 16
    val base = Seq.tabulate(numPerms)(i => 1000L + i)
    val distinct = Seq.tabulate(numPerms)(i => 2000L + i) // agrees on 0/16
    val viral = (1L to 500L).map(id => (id, base))
    val arrivals = ((0L, base) +: viral.drop(1)) :+ (501L, distinct)
    val (reps, out) = Streams.bucketStep(Nil, arrivals, numPerms, 0.5)
    assert(reps.size == 2, s"state grew with cluster size: ${reps.size} representatives")
    assert(out.count(_._2 == 1) == 499) // every dup after the first flagged
    assert(out.head == (0L -> 0) && out.last == (501L -> 0))
  }

  test("streaming LSH dedup flags a viral cluster with O(1) state through the real operator") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val numPerms = 16
    val base = Seq.tabulate(numPerms)(i => 3000L + i)
    val in = MemoryStream[(String, Long, Seq[Long])]
    val q = Streams.lshDedupStream(in.toDS(), numPerms, 0.5,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .toDF("doc_id", "flag").writeStream
      .format("memory").queryName("lsh_viral_out").outputMode(OutputMode.Append).start()
    try {
      in.addData((0L until 250L).map(id => ("0#b", id, base)))
      q.processAllAvailable()
      in.addData((250L until 500L).map(id => ("0#b", id, base)))
      q.processAllAvailable()
      val flags = s.sql("SELECT doc_id, flag FROM lsh_viral_out").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(flags.length == 500)
      assert(flags.head == (0L -> 0))
      assert(flags.tail.forall(_._2 == 1), "cross-batch representative lost")
      // state rows = buckets (1), regardless of cluster size. Max over
      // recentProgress, not lastProgress: a trailing idle micro-batch
      // (zero input rows) may be the last progress event on some Spark
      // versions, and max over data-carrying batches is what bounds state.
      val stateRows = q.recentProgress
        .map(_.stateOperators.map(_.numRowsTotal).sum).max
      assert(stateRows == 1, s"expected 1 state row (one bucket), got $stateRows")
    } finally q.stop()
  }

  test("non-transitive chain: C matching only a dropped dup is deliberately NOT flagged") {
    // A~B and B~C agree at exactly threshold, but A~C agree on nothing.
    // Representative-set semantics: B is a dup of representative A and is
    // dropped; C matches only B (never stored), so C becomes a NEW
    // representative — keep-everything semantics would flag C. This pins
    // the documented lshDedupStream parameter contract.
    val numPerms = 16
    val a = Seq.tabulate(numPerms)(i => 100L + i)
    val cTail = Seq.tabulate(8)(i => 300L + i)
    val b = a.take(8) ++ cTail // 8/16 with A, 8/16 with C
    val c = Seq.tabulate(8)(i => 200L + i) ++ cTail // 0/16 with A
    val (reps, out) = Streams.bucketStep(
      Nil, Seq((0L, a), (1L, b), (2L, c)), numPerms, 0.5)
    assert(out == Seq((0L, 0), (1L, 1), (2L, 0)),
      s"chain verdicts wrong: $out")
    assert(reps == Seq(a, c), "representatives must be A and C, B dropped")
  }

  test("left-outer stream-stream join emits unmatched purchases after watermark expiry") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val inC = MemoryStream[(Long, Long, Timestamp, Double)]
    val inP = MemoryStream[(Long, Long, Timestamp, Double)]
    def named(m: MemoryStream[(Long, Long, Timestamp, Double)]) =
      m.toDF().toDF("user_id", "event_id", "ts", "value")
    val q = Streams.clickAttributionOuter(named(inC), named(inP)).writeStream
      .format("memory").queryName("outer_join_out").outputMode(OutputMode.Append).start()
    // NOT ts(0): a row at exactly the initial watermark (epoch 0) is
    // dropped as late data in its own first micro-batch
    def ots(m: Long) = ts(1000000L + m)
    try {
      // user 1: click 30 min before purchase (matched); user 2: purchase
      // with no click at all (must surface with null click columns)
      inC.addData((1L, 10L, ots(0), 1.5))
      inP.addData((1L, 20L, ots(30), 9.0), (2L, 21L, ots(30), 7.0))
      q.processAllAvailable()
      val matched = s.sql("SELECT user_id, click_id FROM outer_join_out").collect()
      assert(matched.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)),
        "matched row must emit immediately; unmatched must NOT emit before expiry")
      // two sentinel batches: one advances the watermark past the data,
      // the next flushes the expired unmatched purchase as a null-joined row
      Seq(1, 2).foreach { day =>
        inC.addData((-1L, -1L, ots(60L * 24 * day), 0.0))
        inP.addData((-1L, -1L, ots(60L * 24 * day), 0.0))
        q.processAllAvailable()
      }
      val rows = s.sql(
        "SELECT user_id, purchase_id, click_id FROM outer_join_out WHERE user_id > 0")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows == Set((1L, 20L, Some(10L)), (2L, 21L, None)),
        s"outer join rows wrong: $rows")
    } finally q.stop()
  }

  test("outer stream join replay = inner rows + null-click purchases, nothing else") {
    val sf = graft.TestSpark.sf
    val outer = Streams.streamJoinOuterReplay(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val inner = Streams.streamJoinReplay(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2)))).toSeq
    assert(outer.filter(_._3.isDefined) == inner,
      "outer join's matched rows diverge from the inner join")
    val nullRows = outer.filter(_._3.isEmpty)
    assert(nullRows.nonEmpty, "no unattributed purchases surfaced (testdata has them)")
    // a purchase is either matched or null-joined, never both
    val matchedIds = outer.filter(_._3.isDefined).map(_._2).toSet
    assert(nullRows.forall(r => !matchedIds.contains(r._2)),
      "a matched purchase also emitted a null-joined row")
  }

  test("streaming CDC merge: final snapshot = closed-form op application") {
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val keys = graft.Tables.events(s, graft.TestSpark.sf).sparkSession
      .read.parquet(graft.TestSpark.sf + "/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 20 === 0)
      .select("o_orderkey").distinct().collect().map(_.getLong(0))
    val expected = (
      keys.filter(_ % 3 == 1).map(k => k -> md5hex("u" + k)) ++
      keys.filter(_ % 3 == 2).map(k => k -> md5hex("base" + k)) ++
      keys.filter(_ % 3 == 2).map(k => (k + 1000000L) -> md5hex("i" + k))
    ).sortBy(_._1).toSeq
    val got = Streams.streamMergeReplay(s, graft.TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected, s"merged snapshot diverged (${got.size} vs ${expected.size})")
    // deleted keys really are gone
    val gotKeys = got.map(_._1).toSet
    assert(keys.filter(_ % 3 == 0).forall(k => !gotKeys.contains(k)),
      "a deleted key survived the merge")
  }

  test("full-outer stream join = outer rows + never-converted clicks, nothing else") {
    val sf = graft.TestSpark.sf
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    val full = Streams.streamJoinFullReplay(s, sf).collect().map(key).toSeq
    val outer = Streams.streamJoinOuterReplay(s, sf).collect().map(key).toSeq
    // the purchase-side rows (matched + null-click) are exactly the outer join
    assert(full.filter(_._2.isDefined).sorted == outer.sorted,
      "full join's purchase-side rows diverge from the left-outer join")
    // the new class: clicks that never led to a purchase (null purchase_id)
    val orphanClicks = full.filter(_._2.isEmpty)
    assert(orphanClicks.nonEmpty, "no never-converted clicks surfaced")
    assert(orphanClicks.forall(_._3.isDefined),
      "a row with neither side set cannot exist")
    // an orphan click must not also appear matched
    val matchedClicks = full.filter(r => r._2.isDefined && r._3.isDefined)
      .flatMap(_._3).toSet
    assert(orphanClicks.forall(r => !matchedClicks.contains(r._3.get)),
      "a matched click also emitted an orphan row")
  }

  test("tumbling window agg emits a window once its end passes the watermark") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val q = Streams.windowAgg(in.toDF().toDF("event_type", "ts", "value")).writeStream
      .format("memory").queryName("window_agg_out").outputMode(OutputMode.Append).start()
    try {
      // three events in hour 0, one in hour 1; nothing closes yet
      in.addData(("click", ts(5), 1.0), ("click", ts(20), 2.0),
        ("view", ts(40), 4.0), ("click", ts(70), 8.0))
      q.processAllAvailable()
      assert(s.sql("SELECT * FROM window_agg_out").count() == 0,
        "no window may emit before the watermark passes its end")
      // jump 2 days: watermark passes every real window's end
      in.addData(("late", ts(60 * 48), 0.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT event_type, n_events, sum_value FROM window_agg_out ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("click", 2L, 3.0), ("click", 1L, 8.0), ("view", 1L, 4.0))
        .sortBy(_._1) || rows.toSet == Set(("click", 2L, 3.0), ("click", 1L, 8.0), ("view", 1L, 4.0)),
        s"window contents wrong: $rows")
    } finally q.stop()
  }

  test("batch and stream tumbling-window aggregation agree row-for-row on real events") {
    import org.apache.spark.sql.functions._
    val sf = graft.TestSpark.sf
    val streamed = Streams.windowAggStream(s, sf).collect().toSeq
    val batch = graft.Tables.events(s, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), graft.QueryDsl.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("ws_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("ws_us", "event_type")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup emits first occurrence only, across batches") {
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streams.dedupStream(in.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout).writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "a"), (2L, "b"), (1L, "dup-in-batch"))
      q.processAllAvailable()
      in.addData((2L, "dup-across-batch"), (3L, "c"))
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("replay scheduling weights stay in lock-step with the replay set") {
    // the LPT submission order only packs well if the static cost map
    // tracks the actual replay set: no stale keys (a removed replay
    // lingering in the map), no unranked replays (a new replay silently
    // defaulting to mid-weight would be invisible otherwise)
    val weights = Streams.replayWeights.keySet
    val replays = Streams.queries.keySet
    assert(weights.subsetOf(replays),
      s"stale weight entries: ${(weights -- replays).mkString(", ")}")
    assert(replays.subsetOf(weights),
      s"unranked replays (add a weight for LPT packing): ${(replays -- weights).mkString(", ")}")
  }
}
