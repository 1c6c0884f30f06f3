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
  * request's query-type tag — and [[recordRows]] adds the result-row
  * counter the JSON entry points report. State is lock-free adders
  * keyed by tag (driver-side, |distinct tags|-sized), so the
  * instrument never shows up in a profile; [[prometheusText]] renders
  * the standard text exposition the `GET /metrics` route serves.
  *
  * [[setEnabled]](false) turns the whole plane off: [[timed]] runs
  * its body with no clock read and no map touch, [[recordRows]]
  * no-ops — zero overhead beyond one volatile read. */
object Metrics {

  final case class QueryStats(queries: Long, failures: Long, rows: Long,
                              totalSeconds: Double, maxSeconds: Double)

  private final class Cell {
    val queries = new LongAdder
    val failures = new LongAdder
    val rows = new LongAdder
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
      rows.sum(), totalNs.sum() / 1e9, maxNs.get() / 1e9)
  }

  private val cells = new ConcurrentHashMap[String, Cell]()

  @volatile private var enabled = true

  /** Turn the metrics plane on/off (off = [[timed]] degenerates to
    * its body, nothing is recorded). */
  def setEnabled(on: Boolean): Unit = { enabled = on }
  def isEnabled: Boolean = enabled

  /** Record `body`'s wall time (and failure, which rethrows) under
    * `tag`. */
  def timed[A](tag: String)(body: => A): A = {
    if (!enabled) return body
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

  /** Add `n` result rows under `tag` — called by the JSON entry
    * points with the collected response size. */
  def recordRows(tag: String, n: Long): Unit =
    if (enabled) cells.computeIfAbsent(tag, _ => new Cell).rows.add(n)

  def snapshot: Map[String, QueryStats] = {
    val out = Map.newBuilder[String, QueryStats]
    cells.forEach((k, v) => out += k -> v.snapshot)
    out.result()
  }

  /** Prometheus text exposition (format 0.0.4) of every tag's
    * counters — the payload of `GET /metrics`. Metric names are the
    * repo's own (`graft_query_*`); they mirror the reference's
    * `optiprism_query_queries_total` /
    * `optiprism_query_execution_time_seconds` pair plus a failures
    * and a result-rows counter. Tags render sorted so scrapes are
    * deterministic. */
  def prometheusText: String = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.9f", Double.box(d))
    val snap = snapshot.toSeq.sortBy(_._1)
    val sb = new StringBuilder
    def family(name: String, typ: String, value: QueryStats => String): Unit = {
      sb.append(s"# TYPE $name $typ\n")
      snap.foreach { case (tag, s) =>
        sb.append(s"""$name{query="${esc(tag)}"} ${value(s)}""").append('\n')
      }
    }
    family("graft_query_queries_total", "counter", _.queries.toString)
    family("graft_query_failures_total", "counter", _.failures.toString)
    family("graft_query_rows_total", "counter", _.rows.toString)
    family("graft_query_execution_time_seconds_sum", "counter", s => fmt(s.totalSeconds))
    family("graft_query_execution_time_seconds_max", "gauge", s => fmt(s.maxSeconds))
    sb.result()
  }

  def reset(): Unit = cells.clear()
}
