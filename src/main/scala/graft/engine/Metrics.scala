package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Query observability — the Spark build of the reference's per-query
  * prometheus instruments (reference common/src/types.rs:114-115
  * `optiprism_query_queries_total` counter and
  * `optiprism_query_execution_time_seconds` histogram). The reference
  * records both inside each request handler
  * (query/src/event_segmentation.rs:131-133); [[timed]] is the same
  * shape — wrap the request, record wall time and failures under the
  * request's query-type tag. State is lock-free adders keyed by tag
  * (driver-side, |distinct tags|-sized), so the instrument never
  * shows up in a profile; a prometheus exporter would read
  * [[snapshot]]. The JSON entry points in [[JsonApi]] are pre-tagged
  * with the reference's route names. */
object Metrics {

  final case class QueryStats(queries: Long, failures: Long,
                              totalSeconds: Double, maxSeconds: Double)

  private final class Cell {
    val queries = new LongAdder
    val failures = new LongAdder
    val totalNs = new LongAdder
    val maxNs = new AtomicLong(0L)
    def record(durationNs: Long, failed: Boolean): Unit = {
      queries.increment()
      if (failed) failures.increment()
      totalNs.add(durationNs)
      var cur = maxNs.get()
      while (durationNs > cur && !maxNs.compareAndSet(cur, durationNs))
        cur = maxNs.get()
    }
    def snapshot: QueryStats = QueryStats(queries.sum(), failures.sum(),
      totalNs.sum() / 1e9, maxNs.get() / 1e9)
  }

  private val cells = new ConcurrentHashMap[String, Cell]()

  /** Record `body`'s wall time (and failure, which rethrows) under
    * `tag`. */
  def timed[A](tag: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try {
      val out = body
      cells.computeIfAbsent(tag, _ => new Cell)
        .record(System.nanoTime() - t0, failed = false)
      out
    } catch {
      case e: Throwable =>
        cells.computeIfAbsent(tag, _ => new Cell)
          .record(System.nanoTime() - t0, failed = true)
        throw e
    }
  }

  def snapshot: Map[String, QueryStats] = {
    val out = Map.newBuilder[String, QueryStats]
    cells.forEach((k, v) => out += k -> v.snapshot)
    out.result()
  }

  def reset(): Unit = cells.clear()
}
