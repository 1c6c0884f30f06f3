package graft.engine

import graft.model.PropFilter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class group profiles — the Spark build of the reference's
  * replacing group tables (reference cmd/src/lib.rs:256-270 creates 5
  * `group_{0..4}` tables with is_replacing; the ingester resolves and
  * rewrites the group record on every event, bumping its version;
  * search/list lives in platform/src/group_records.rs:220-320 and
  * query/src/group_records.rs).
  *
  * Storage-engine translation: the reference's LSM replace-on-merge
  * becomes a materialized aggregate over the immutable event log —
  * one `groupBy(group_id)` computing, per property, the value carried
  * by the group's LAST event that SET it (`max_by` over the version
  * column, null values don't overwrite — the ingester's semantics),
  * plus the version / first-seen / last-seen / event-count bookkeeping
  * columns the reference maintains. At 100 TB this is one shuffle of
  * (group, slim properties) with map-side combine; the profile table
  * it yields is |groups|-sized and is the natural broadcast side of
  * every profile join. Periodic [[graft.sources.Store.compactGroupTable]]
  * persistence makes it incremental.
  */
object Groups {

  /** Materialize the profile table of one group dimension.
    * Output: (groupCol, version, n_events, first_seen_us,
    * last_seen_us, props...). */
  def buildProfiles(events0: DataFrame, groupCol: String, props: Seq[String],
                    versionCol: String = "event_id", tsCol: String = "ts",
                    projectId: Option[Long] = None): DataFrame = {
    val events = Exprs.tenantScope(events0, projectId)
    val aggs = Seq(
      max(col(versionCol)).as("version"),
      count(lit(1)).as("n_events"),
      unix_micros(min(col(tsCol))).as("first_seen_us"),
      unix_micros(max(col(tsCol))).as("last_seen_us")) ++
      props.map(p =>
        // last event that SET the property wins; nulls don't overwrite
        max_by(col(p), when(col(p).isNotNull, col(versionCol))).as(p))
    events.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Group-record search: filter → sort (with the group id as the
    * deterministic tiebreak) → limit. Compiles to
    * TakeOrderedAndProject — a distributed top-k, no global sort
    * (reference group_records.rs list with filters + SortablePropertyRef). */
  def search(profiles: DataFrame, filter: Option[Column],
             sortBy: Seq[(String, Boolean)], idCol: String, limitN: Int): DataFrame = {
    val filtered = filter.fold(profiles)(profiles.filter)
    val order = sortBy.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    } :+ col(idCol).asc
    filtered.orderBy(order: _*).limit(limitN)
  }

  /** Current-value segment condition over the PROFILE table (the
    * first-class form of SegmentCondition::HasPropertyValue — the
    * latest-event emulation in [[Segments]] remains for callers
    * without a materialized profile). Returns the qualifying ids. */
  def hasPropertyValue(profiles: DataFrame, f: PropFilter, idCol: String): DataFrame =
    profiles.filter(Exprs.propPredicate(f)).select(col(idCol))
}
