package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Per-GENERATION memoization of the tiny driver-side reads every
  * index operation repeats — the analyzer row ([[TextAnalysis
  * .readAnalyzer]]'s parquet `head()`) and the codebook frames the
  * vector search tails re-open per query. One parquet footer/head per
  * generation instead of per search matters exactly when search QPS
  * does: at one store round trip per operation the driver becomes the
  * serving bottleneck long before the executors do.
  *
  * Only GENERATION roots — a last path segment of exactly `gen=N`,
  * the shape [[IndexGen.resolveRoot]] produces — are cacheable: a
  * committed generation is immutable, so invalidation is free (a
  * rebuild commits a NEW generation, which is a NEW key). Flat
  * (pre-generation) artifacts mutate in place (a rebuild overwrites
  * the same directories), so they always read through — correctness
  * never depends on this cache, only the per-operation round-trip
  * count does. A user directory that merely CONTAINS "gen=" in some
  * other segment is flat, not cacheable — the check is on the final
  * segment, digits only.
  *
  * Entries pin their owning session by IDENTITY: a hit must come
  * from the very session that computed it (identity hash codes alone
  * are reusable after GC, so a restarted session could otherwise
  * collide into a stopped session's plan objects). The session
  * reference is STRONG on purpose — a cached DataFrame's plan holds
  * its session strongly anyway, so a weak reference could never
  * clear and would only hide the pinning; instead, eviction keys on
  * session LIFECYCLE: every miss-path write first sweeps entries
  * whose owning session has been STOPPED (their plans can never be
  * executed again), so a retired session's entries leave promptly
  * without ever evicting a live session's hot entries.
  *
  * Bounded: if LIVE entries alone exceed [[MaxEntries]] after the
  * stopped-session sweep, the map clears wholesale (generations
  * retire monotonically, so a rare full re-read beats LRU
  * machinery). */
object GenCache {

  private val MaxEntries = 256

  private final case class Entry(session: SparkSession, value: AnyRef)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Drop every entry whose owning session is stopped — their plan
    * objects are dead weight that a weak reference could never
    * reclaim (the cached value pins the session strongly). Runs on
    * every miss-path write; O(entries) over a ≤[[MaxEntries]] map. */
  private def sweepStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
  }

  private val GenSegment = ".*/gen=\\d+/?".r

  private def cacheable(root: String): Boolean =
    GenSegment.matches(root)

  /** `f` memoized under (session identity, generation root, kind);
    * computed every call for non-generation roots. */
  def memo[T <: AnyRef](spark: SparkSession, root: String, kind: String)(
      f: => T): T =
    if (!cacheable(root)) f
    else {
      val key = s"${System.identityHashCode(spark)}#$root#$kind"
      cache.get(key) match {
        case e: Entry if (e.session eq spark) &&
            !spark.sparkContext.isStopped =>
          e.value.asInstanceOf[T]
        case _ =>
          // miss or stale hash-collision: compute and replace (racing
          // computes are benign — same value). Stopped sessions'
          // entries sweep out here, on the write path, so the
          // wholesale clear below only fires when LIVE entries alone
          // exceed the cap.
          val v = f
          sweepStopped()
          if (cache.size > MaxEntries) cache.clear()
          cache.put(key, Entry(spark, v)): Unit
          v
      }
    }

  /** Drop every session's entries for (`root`, kinds starting with
    * `kindPrefix`) — the hook for the ONE way a committed generation
    * legitimately mutates: appends land new cell files inside it
    * (maintenance writes into the resolved root), which can RAISE a
    * memoized footer-stats bound. Codebook-family entries stay (an
    * append never rewrites codebooks); only the append path calls
    * this, so the per-search cost of the memoized reads is
    * unchanged. */
  def invalidate(root: String, kindPrefix: String): Unit = {
    val needle = s"#$root#$kindPrefix"
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().contains(needle)) it.remove()
  }

  /** Test hook: entry count. */
  def size: Int = cache.size

  /** Test hook: drop everything. */
  def clear(): Unit = cache.clear()
}
