package graft.engine

import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate / expression builders: the Spark analog of the
  * reference's expr builders (reference query/src/expr.rs:38-391 —
  * time_expression, event_expression, named_property_expression).
  * Everything stays a Catalyst `Column` so filters are codegen'd and
  * pushed down to the parquet scan.
  */
object Exprs {

  /** ts-in-range predicate (reference query/src/expr.rs:38-57). */
  def timePredicate(tsCol: Column, time: QueryTime): Column = time match {
    case QueryTime.Between(from, to) => tsCol >= lit(from) && tsCol <= lit(to)
    case QueryTime.From(from)        => tsCol >= lit(from)
    case QueryTime.Last(n, unit, now) =>
      val from = new java.sql.Timestamp(now.getTime - n * unit.millis)
      tsCol >= lit(from) && tsCol <= lit(now)
  }

  /** [[timePredicate]] plus the implied bounds on a DATE partition
    * column — the conjunct that turns a time filter into PARTITION
    * PRUNING on a date-partitioned events store (`event_date=…/`, the
    * layout the streaming sink writes and Compact.runPartitioned
    * maintains). Row-group statistics prune within files; only a
    * partition-column predicate prunes whole directories from the
    * listing, which at 100 TB is the difference between touching one
    * day and listing three years. Bounds are DATEs of the ts bounds
    * (inclusive: the partition holding `from`'s midnight-truncation
    * through the one holding `to`), so results are identical to the
    * ts predicate alone. */
  def timePredicateWithPartitionPruning(tsCol: Column, dateCol: Column,
                                        time: QueryTime): Column = {
    val dateBounds = time match {
      case QueryTime.Between(from, to) =>
        dateCol >= to_date(lit(from)) && dateCol <= to_date(lit(to))
      case QueryTime.From(from) => dateCol >= to_date(lit(from))
      case QueryTime.Last(n, unit, now) =>
        val from = new java.sql.Timestamp(now.getTime - n * unit.millis)
        dateCol >= to_date(lit(from)) && dateCol <= to_date(lit(now))
    }
    timePredicate(tsCol, time) && dateBounds
  }

  /** [[timePredicate]], auto-upgraded to
    * [[timePredicateWithPartitionPruning]] when the frame carries the
    * canonical `event_date` partition column
    * ([[Tables.eventsWithDate]]) — the one choke point that lets
    * every engine path (segmentation, funnels, records) inherit
    * directory pruning the moment its input routes through the
    * date-partitioned layout, with identical results either way (the
    * date bounds are implied by the ts bounds, never narrowing). */
  def timePredicateFor(df: org.apache.spark.sql.DataFrame, tsCol: String,
                       time: QueryTime): Column =
    if (df.columns.contains("event_date"))
      timePredicateWithPartitionPruning(col(tsCol), col("event_date"), time)
    else timePredicate(col(tsCol), time)

  /** Event-name equality. The reference encodes event names to
    * dictionary keys first (expr.rs:60-115); we store plain strings so
    * parquet dictionary encoding gives the same effect transparently.
    */
  def eventPredicate(eventCol: Column, name: String): Column = eventCol === lit(name)

  /** Custom-event predicate: recursive OR over members, each member
    * ANDed with its own filters (reference expr.rs:60-115 expands
    * custom events at plan-build time; metadata/src/custom_events.rs
    * holds the recursive definition). Stays one boolean Column, so it
    * pushes down to the scan like any other filter. */
  def customEventPredicate(eventCol: Column, ce: CustomEvent): Column =
    ce.members.map {
      case CustomEventMember.Event(name, filters) =>
        and(name.map(eventPredicate(eventCol, _)).toSeq ++ filters.map(propPredicate))
      case CustomEventMember.Custom(inner) =>
        customEventPredicate(eventCol, inner)
    }.reduce(_ || _)

  /** Property predicate: ops per reference common/src/query.rs:235-262,
    * multi-value → OR chain (isin), built in expr.rs:299-391.
    */
  def propPredicate(f: PropFilter): Column = propPredicateOn(col(f.column), f)

  /** Same predicate over an arbitrary value expression (e.g. the
    * `max_by`-derived latest value in a fused segment pass). */
  def propPredicateOn(c: Column, f: PropFilter): Column = {
    def orChain(per: Any => Column): Column =
      f.values.map(per).reduce(_ || _)
    f.op match {
      case PropOp.Eq       => if (f.values.size == 1) c === lit(f.values.head) else c.isin(f.values: _*)
      case PropOp.Neq      => if (f.values.size == 1) c =!= lit(f.values.head) else !c.isin(f.values: _*)
      case PropOp.Gt       => orChain(v => c > lit(v))
      case PropOp.Gte      => orChain(v => c >= lit(v))
      case PropOp.Lt       => orChain(v => c < lit(v))
      case PropOp.Lte      => orChain(v => c <= lit(v))
      case PropOp.True     => c === lit(true)
      case PropOp.False    => c === lit(false)
      case PropOp.Exists   => c.isNotNull
      case PropOp.Empty    => c.isNull
      case PropOp.Like     => orChain(v => c.like(v.toString))
      case PropOp.NotLike  => orChain(v => !c.like(v.toString))
      case PropOp.Regex    => orChain(v => c.rlike(v.toString))
      case PropOp.NotRegex => orChain(v => !c.rlike(v.toString))
    }
  }

  /** Conjunction of all filters, or `true` when empty. */
  def and(preds: Seq[Column]): Column =
    if (preds.isEmpty) lit(true) else preds.reduce(_ && _)

  /** Tenant scope — every reference plan carries a `project_id`
    * (reference common/src/types.rs:22; SURVEY §7.3 keeps it even for
    * single-project data), and the reference's primary sort key is
    * `(project_id, id)` (cmd/src/lib.rs:230) — tenancy is its
    * first-class scan bound. On the canonical layout
    * ([[Tables.eventsPartitionedRoot]]'s
    * `project_id=N/event_date=D/`, and any store written by
    * [[graft.sources.Store.writeEvents]]) the column is the LEADING
    * PARTITION column, so this equality predicate prunes whole tenant
    * subtrees from the file listing before any day-level pruning; a
    * store without the column is a single-project deployment and the
    * scope is vacuously satisfied. */
  def tenantScope(df: org.apache.spark.sql.DataFrame, projectId: Option[Long]): org.apache.spark.sql.DataFrame =
    projectId match {
      case Some(p) if df.columns.contains("project_id") =>
        df.filter(col("project_id") === lit(p))
      case _ => df
    }

  /** Time bucket: group key #1 of every segmentation query (reference
    * event_segmentation.rs:784-799 uses DataFusion's date_trunc UDF;
    * Spark's built-in date_trunc has identical Monday-start week
    * semantics, verified in TimeSpec).
    */
  def bucket(tsCol: Column, unit: TimeIntervalUnit): Column =
    date_trunc(unit.truncName, tsCol)
}
