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
  * Entries pin their owning session by IDENTITY through a weak
  * reference: a hit must come from the very session that computed it
  * (identity hash codes alone are reusable after GC, so a restarted
  * session could otherwise collide into a stopped session's plan
  * objects — the weak reference makes that a recompute, never a
  * stale hit), and a collected session's entries become dead weight
  * reclaimed by the size sweep rather than live hazards.
  *
  * Bounded: the map clears wholesale past [[MaxEntries]] (generations
  * retire monotonically, so a rare full re-read beats LRU machinery). */
object GenCache {

  private val MaxEntries = 256

  private final case class Entry(
      session: java.lang.ref.WeakReference[SparkSession], value: AnyRef)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private val GenSegment = ".*/gen=\\d+/?".r

  private def cacheable(root: String): Boolean =
    GenSegment.matches(root)

  /** `f` memoized under (session identity, generation root, kind);
    * computed every call for non-generation roots. */
  def memo[T <: AnyRef](spark: SparkSession, root: String, kind: String)(
      f: => T): T =
    if (!cacheable(root)) f
    else {
      if (cache.size > MaxEntries) cache.clear()
      val key = s"${System.identityHashCode(spark)}#$root#$kind"
      cache.get(key) match {
        case e: Entry if e.session.get() eq spark =>
          e.value.asInstanceOf[T]
        case _ =>
          // miss, stale hash-collision, or collected session: compute
          // and replace (racing computes are benign — same value)
          val v = f
          cache.put(key,
            Entry(new java.lang.ref.WeakReference(spark), v)): Unit
          v
      }
    }

  /** Test hook: entry count. */
  def size: Int = cache.size

  /** Test hook: drop everything. */
  def clear(): Unit = cache.clear()
}
