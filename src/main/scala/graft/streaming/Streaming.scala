package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming ingestion. The reference ingests events one
  * HTTP request at a time into a WAL+memtable (reference
  * ingester/src/executor.rs:127-228); there is no streaming query
  * engine (SURVEY.md §2.12). Here ingestion is a first-class streaming
  * path: readStream → transforms → writeStream, with watermarked
  * windowed aggregates and custom per-user state — the additive
  * streaming surface the reference lacks.
  */
object Streaming {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String, value: Double)

  final case class UserTotals(user_id: Long, events: Long, revenue: Double)

  final case class SessionState(count: Long, revenue: Double, lastTsMs: Long,
                                startMs: Long = Long.MinValue)

  final case class Session(user_id: Long, events: Long, revenue: Double,
                           startMs: Long, endMs: Long)

  /** Watermarked per-window event counts (the streaming twin of
    * event-segmentation's CountEvents): late data beyond the watermark
    * is dropped, state is bounded, scales by key-hash shuffle. */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Running per-user totals via mapGroupsWithState — the streaming
    * analog of the reference's group-profile version bump on ingest
    * (ingester resolves + rewrites the user record per event). Update
    * mode: one row per user per batch. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserTotals](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          var c = prev.count
          var rev = prev.revenue
          var last = prev.lastTsMs
          rows.foreach { e =>
            c += 1; rev += e.value; last = math.max(last, e.ts.getTime)
          }
          state.update(SessionState(c, rev, last))
          UserTotals(user, c, rev)
      }
  }

  /** Session windows: flatMapGroupsWithState closing a session after
    * `gapMs` of user inactivity (event-time, driven by the watermark).
    * The funnel DSL declares-but-never-implements session counting
    * (reference common/src/funnel.rs:69 `unimplemented!()`); this is
    * the real version. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val closed = scala.collection.mutable.ArrayBuffer[Session]()
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st.count > 0 && t - st.lastTsMs > gapMs) {
              closed += Session(user, st.count, st.revenue, st.startMs, st.lastTsMs)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            // session start is carried in state so a session spanning
            // micro-batches (or closed by event-time timeout) reports
            // its true start, not a reconstruction
            val start = if (st.count == 0) t else st.startMs
            st = SessionState(st.count + 1, st.revenue + e.value, t, start)
          }
          if (state.hasTimedOut) {
            if (st.count > 0) closed += Session(user, st.count, st.revenue, st.startMs, st.lastTsMs)
            state.remove()
          } else {
            state.update(st)
            state.setTimeoutTimestamp(st.lastTsMs + gapMs)
          }
          closed.iterator
      }
  }

  /** Streaming sink: append parquet partitioned by event date — the
    * write path that replaces the reference's WAL+memtable+compactor
    * (storage/src/db.rs:702-800): the transaction/commit log of the
    * file sink provides the WAL semantics. */
  def writeEventsStream(events: DataFrame, path: String, checkpoint: String) =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_date")
      .outputMode(OutputMode.Append())
}
