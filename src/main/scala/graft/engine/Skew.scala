package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-proof aggregation: the salting pattern for keys whose
  * frequency distribution is extreme enough that one grouping key's
  * rows would serialize a single reduce task at 100 TB (the
  * aggregation sibling of the funnel's per-user bot cap,
  * [[Funnel.Request.maxEventsPerUser]]).
  *
  * Spark's hash aggregate already does map-side partial aggregation,
  * which absorbs MOST skew — a hot key collapses to one partial row
  * per map task before the exchange. Salting matters for the cases
  * partial aggregation cannot absorb: high-cardinality-state
  * aggregates (large collect-style or distinct-heavy state per key)
  * or downstream per-key work where the FINAL per-key row is cheap
  * but the per-(key, salt) reduction is the expensive part. The
  * pattern: group by (keys, salt) first — the hot key's rows spread
  * over `buckets` reducers — then merge the salt partials in a
  * second, result-sized aggregation.
  *
  * Only DECOMPOSABLE aggregates fit (partial per salt + exact merge);
  * the constructors below cover the engine's set. COUNT DISTINCT is
  * deliberately absent: distinct state does not merge by summing —
  * use Spark's two-level exact form
  * (`groupBy(keys, value).count` → `groupBy(keys).count`) or an
  * approx sketch instead.
  */
object Skew {

  /** One decomposable aggregate: partial (per salt bucket) and merge
    * (over salt partials) stages, both named `name` in the output. */
  final case class SaltedAgg private (
      partial: String => Column, merge: String => Column, name: String)

  def count(name: String): SaltedAgg =
    SaltedAgg(p => org.apache.spark.sql.functions.count(lit(1)).as(p),
      p => sum(col(p)).as(name), name)

  def sum_(c: Column, name: String): SaltedAgg =
    SaltedAgg(p => sum(c).as(p), p => sum(col(p)).as(name), name)

  def min_(c: Column, name: String): SaltedAgg =
    SaltedAgg(p => min(c).as(p), p => min(col(p)).as(name), name)

  def max_(c: Column, name: String): SaltedAgg =
    SaltedAgg(p => max(c).as(p), p => max(col(p)).as(name), name)

  /** Exact average via (sum, count) partials — never avg-of-avgs. */
  def avg_(c: Column, name: String): SaltedAgg =
    SaltedAgg(
      p => struct(sum(c).as("s"), org.apache.spark.sql.functions.count(c).as("n")).as(p),
      p => (sum(col(p)("s")) / sum(col(p)("n"))).as(name), name)

  /** Two-phase salted aggregation over `keys`. The salt is a
    * deterministic function of the SALT SOURCE columns (default: a
    * per-partition row counter via `monotonically_increasing_id` —
    * uniform by construction and never a shuffle of its own), so a
    * hot key's rows spread across `buckets` reduce tasks in phase 1;
    * phase 2 merges the ≤ `buckets` partial rows per key — result-
    * sized, skew-free by definition. Results are salt-invariant:
    * every [[SaltedAgg]] merge is exact, so the output equals the
    * direct `groupBy(keys)` aggregate row for row. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Seq[SaltedAgg], buckets: Int = 32,
                      saltSource: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "saltedAggregate needs at least one key")
    require(aggs.nonEmpty, "saltedAggregate needs at least one aggregate")
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val names = aggs.map(_.name)
    require(names.distinct.size == names.size, s"duplicate aggregate names: $names")
    val salt = pmod(
      saltSource.map(c => xxhash64(c)).getOrElse(monotonically_increasing_id()),
      lit(buckets.toLong))
    val partialNames = aggs.zipWithIndex.map { case (a, i) => s"__p${i}_${a.name}" }
    val partial = df
      .withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial(partialNames.head),
        aggs.tail.zip(partialNames.tail).map { case (a, p) => a.partial(p) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(partialNames.head),
        aggs.tail.zip(partialNames.tail).map { case (a, p) => a.merge(p) }: _*)
  }
}
