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
  * Only GENERATION roots (`…/gen=N`, [[IndexGen]]) are cacheable: a
  * committed generation is immutable, so invalidation is free — a
  * rebuild commits a NEW generation, which is a NEW key. Flat
  * (pre-generation) artifacts mutate in place (a rebuild overwrites
  * the same directories), so they always read through — correctness
  * never depends on this cache, only the per-operation round-trip
  * count does. Keys carry the session identity so a restarted session
  * can never serve another session's plan objects.
  *
  * Bounded: the map clears wholesale past [[MaxEntries]] (generations
  * retire monotonically, so a rare full re-read beats LRU machinery). */
object GenCache {

  private val MaxEntries = 256
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cacheable(root: String): Boolean = root.contains("/gen=")

  /** `f` memoized under (session, generation root, kind); computed
    * every call for non-generation roots. */
  def memo[T <: AnyRef](spark: SparkSession, root: String, kind: String)(
      f: => T): T =
    if (!cacheable(root)) f
    else {
      if (cache.size > MaxEntries) cache.clear()
      cache.computeIfAbsent(
        s"${System.identityHashCode(spark)}#$root#$kind",
        _ => f).asInstanceOf[T]
    }

  /** Test hook: entry count. */
  def size: Int = cache.size

  /** Test hook: drop everything. */
  def clear(): Unit = cache.clear()
}
