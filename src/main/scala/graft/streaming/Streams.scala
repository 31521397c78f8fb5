package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's stateful operators
  * (SURVEY.md §7.2 M3: "optional Structured Streaming demo"; the batch
  * forms live in graft.operators.Events / Dedup).
  *
  * These are DataFrame→DataFrame transforms over an unbounded source —
  * callers plug in `readStream` (Kafka/files at scale; MemoryStream in
  * tests, see StreamingSpec) and any `writeStream` sink. State is bounded:
  * the session aggregation evicts via watermark; the dedup operator evicts
  * via processing-time timeout — both are required for an unbounded run at
  * cluster scale.
  */
object Streams {

  /** Streaming gap-sessionization: native `session_window` (30-min gap)
    * with a 1-hour watermark. Emits one row per closed session in append
    * mode — the streaming equivalent of Events.sessionize. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"), col("sum_value"))

  final case class Seen(ids: Seq[Long])

  /** Streaming exact dedup by event_id: emits only first occurrences,
    * per-key seen-set state with a processing-time timeout so state can't
    * grow unboundedly (the streaming equivalent of Dedup.exactDedup for
    * an id key). */
  /** @param timeout ProcessingTimeTimeout (+ `stateTimeout`) in production
    *   so idle keys are evicted; NoTimeout in tests, where the
    *   timeout-check micro-batches would spin forever on an idle
    *   MemoryStream. */
  def dedupStream[T](
      events: Dataset[(Long, T)],
      stateTimeout: String = "1 hour",
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[(Long, T)] = {
    import events.sparkSession.implicits._
    implicit val tupleEnc = events.encoder
    events
      .groupByKey { case (id, _) => id % 1024 } // bounded key space: shard state
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: Long, rows: Iterator[(Long, T)], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.map(_.ids.toSet).getOrElse(Set.empty[Long])
            val (emitted, nowSeen) =
              rows.foldLeft((List.empty[(Long, T)], seen)) {
                case ((out, ids), (id, v)) =>
                  if (ids.contains(id)) (out, ids) else ((id, v) :: out, ids + id)
              }
            state.update(Seen(nowSeen.toSeq))
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(stateTimeout)
            emitted.reverseIterator
          }
      }
  }
}
