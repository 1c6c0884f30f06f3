package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  final case class FunnelState(step: Int, startMs: Long, done: Boolean)
  final case class Conversion(user_id: Long, started_ms: Long,
                              converted_ms: Long, duration_ms: Long)

  /** Streaming funnel — the streaming twin of the flagship batch
    * operator (graft.engine.Funnel), for Exact steps with
    * Count::Unique: per-user state advances on each step-matching
    * event inside the conversion window; window overflow restarts
    * from the current row (the batch machine's flush+reprocess), a
    * completed sequence emits ONE Conversion row (Append mode) and
    * marks the user done. State is O(1) per user (step index + start
    * time), carried across micro-batches; rows sort by event time
    * within a batch and the watermark bounds cross-batch lateness.
    *
    * State is BOUNDED: users with no attempt in flight keep no state,
    * and an in-flight attempt expires by event-time timeout once the
    * watermark passes its window end — expiring is exactly the
    * overflow-restart the machine would perform on the next row.
    * Converted users keep a done marker (the cost of exact Unique
    * dedup — the batch operator pays the same per-user memory).
    * The batch operator remains the full-featured path (excludes,
    * constants, any-order, sessions, breakdowns). */
  def funnelConversions(events: Dataset[Event], stepTypes: Seq[String],
                        windowMs: Long,
                        watermark: String = "10 minutes"): Dataset[Conversion] = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // in-flight attempt aged past its window: dropping the
            // state = the machine's overflow restart
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(FunnelState(0, 0L, done = false))
            val out = scala.collection.mutable.ArrayBuffer[Conversion]()
            for (e <- sorted if !st.done) {
              val t = e.ts.getTime
              if (st.step > 0 && t - st.startMs > windowMs)
                st = FunnelState(0, 0L, done = false) // overflow: restart, reprocess row
              if (e.event_type == stepTypes(st.step)) {
                val start = if (st.step == 0) t else st.startMs
                if (st.step == stepTypes.size - 1) {
                  out += Conversion(user, start, t, t - start)
                  st = FunnelState(0, 0L, done = true) // Unique: one conversion per user
                } else st = FunnelState(st.step + 1, start, done = false)
              }
            }
            if (st.done) state.update(st)
            else if (st.step == 0) { if (state.exists) state.remove() }
            else {
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.startMs + windowMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming incremental materialized aggregate view — the
    * continuous-ingest counterpart of
    * [[graft.sources.Compact.Options.sumOn]]: each micro-batch appends
    * ONE partial additive aggregate (`groupBy(keys).agg(aggs)` over
    * just the batch) via [[graft.sources.Store.atomicAppendOnce]], so
    * a foreachBatch restart replaying the last batch is exactly-once
    * in the store even after compaction consumed the batch file. The
    * view read folds partials to O(groups) rows without rescanning any
    * raw event; `sink` receives it after each batch. Periodic
    * [[graft.sources.Compact.run]] with the same `opts` bounds the
    * partial count physically — reads are correct at any point in
    * between, because merge and reader apply the identical fold.
    * `opts.sumOn` must name the key columns as aliased in `keys`. */
  def streamingAggView(rows: DataFrame, storeDir: String,
                       keys: Seq[Column], aggs: Seq[Column],
                       opts: graft.sources.Compact.Options)(
                       sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val partial = batch.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      graft.sources.Store.atomicAppendOnce(partial, storeDir,
        f"batch-$batchId%09d"): Unit
      sink(graft.sources.Compact.read(batch.sparkSession, storeDir, opts),
        batchId)
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
