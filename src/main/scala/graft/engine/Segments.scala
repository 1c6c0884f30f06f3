package graft.engine

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segment (user-set) computation. The reference evaluates a
  * `SegmentExpr` tree over user-sorted events and emits qualifying
  * user ids, then each aggregate expression skips non-members
  * (reference query/src/logical_plan/segment.rs:65-107,
  * physical_plan/segmented_aggregate.rs:365-399 — effectively a
  * broadcast left-semi join on user id).
  *
  * Spark build: `groupBy(user).agg(...).filter(having).select(user)`
  * per condition, `intersect`/`union` for And/Or, then a LEFT SEMI
  * join back onto events. At 100 TB the user-set is small relative to
  * events, so Catalyst/AQE picks a broadcast semi join — exactly the
  * reference's HashMap-membership design, but distributed.
  *
  * The reference leaves `RelativeCount`, `HistoricalCount`,
  * `HasPropertyValue` and `AfterFirstUse` unimplemented
  * (common/src/query.rs:313-399, event_segmentation.rs:456-545); the
  * first and last are implemented here for real.
  */
object Segments {

  private def cmp(c: Column, op: PropOp, v: Any): Column = op match {
    case PropOp.Eq  => c === lit(v)
    case PropOp.Neq => c =!= lit(v)
    case PropOp.Gt  => c > lit(v)
    case PropOp.Gte => c >= lit(v)
    case PropOp.Lt  => c < lit(v)
    case PropOp.Lte => c <= lit(v)
    case other      => sys.error(s"unsupported segment comparison $other")
  }

  private def cmpCols(a: Column, op: PropOp, b: Column): Column = op match {
    case PropOp.Eq  => a === b
    case PropOp.Neq => a =!= b
    case PropOp.Gt  => a > b
    case PropOp.Gte => a >= b
    case PropOp.Lt  => a < b
    case PropOp.Lte => a <= b
    case other      => sys.error(s"unsupported segment comparison $other")
  }

  /** The scope's resolved `[from, to]` ts bounds, for the three
    * range-shaped scopes (Between/From/Last); None for the
    * structural scopes (Each/AfterFirstUse). `From` has no upper
    * bound. */
  private def tsBounds(t: SegmentTime, reqTime: QueryTime)
      : Option[(java.sql.Timestamp, Option[java.sql.Timestamp])] = t match {
    case SegmentTime.Between(f, to) => Some((f, Some(to)))
    case SegmentTime.From(f)        => Some((f, None))
    case SegmentTime.Last(n, unit) =>
      val to = reqTime match {
        case QueryTime.Between(_, t2)  => t2
        case QueryTime.Last(_, _, now) => now
        case QueryTime.From(_)         => new java.sql.Timestamp(Long.MaxValue / 2)
      }
      Some((new java.sql.Timestamp(to.getTime - n * unit.millis), Some(to)))
    case _ => None
  }

  /** The DATE-partition bounds implied by the scope's ts bounds —
    * the conjunct that upgrades a segment condition's time scope to
    * directory pruning on the canonical `event_date=`-partitioned
    * layout (same construction as
    * [[Exprs.timePredicateWithPartitionPruning]]: inclusive date
    * bounds of the ts bounds, so results are identical). */
  private def dateScopePred(t: SegmentTime, reqTime: QueryTime,
                            dateCol: Column): Option[Column] =
    tsBounds(t, reqTime).map { case (from, to) =>
      to.foldLeft(dateCol >= to_date(lit(from)))((p, t2) =>
        p && dateCol <= to_date(lit(t2)))
    }

  /** Restrict events to the condition's time scope. Range scopes on a
    * date-partitioned frame also carry the implied `event_date`
    * bounds so the scan prunes directories. `AfterFirstUse` needs the
    * per-user first event timestamp — one window pass, shuffled by
    * user, bounded state. */
  private def timeScoped(events: DataFrame, t: SegmentTime, reqTime: QueryTime,
                         userCol: String, tsCol: String): DataFrame = t match {
    case SegmentTime.AfterFirstUse(within, unit) =>
      val w = Window.partitionBy(col(userCol))
      events
        .withColumn("__first_ts", min(col(tsCol)).over(w))
        .filter(unix_millis(col(tsCol)) - unix_millis(col("__first_ts")) <=
          within * unit.millis)
        .drop("__first_ts")
    case _: SegmentTime.Each => events // rolling window handled by caller
    case ranged =>
      val p = timePred(ranged, reqTime, tsCol)
      val withDate =
        if (events.columns.contains("event_date"))
          dateScopePred(ranged, reqTime, col("event_date")).map(p && _).getOrElse(p)
        else p
      events.filter(withDate)
  }

  /** One condition → DataFrame[user_id] of qualifying users. */
  def userSet(
      events: DataFrame, cond: SegmentCondition, reqTime: QueryTime,
      userCol: String, tsCol: String, eventCol: String): DataFrame = cond match {

    case SegmentCondition.DidEventCount(ev, filters, op, value, SegmentTime.Each(n, unit)) =>
      // Rolling-window count (reference segmentation/count.rs:29-212 +
      // time_range.rs `SegmentTime::Each`): qualifies if ANY window of
      // length n*unit satisfies. Approximated as the reference does —
      // bucket ts by the window length, count per (user, bucket),
      // qualify if any bucket satisfies the comparison.
      val w = n * unit.millis
      val pred = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++ filters.map(Exprs.propPredicate))
      events.filter(pred)
        .groupBy(col(userCol), (unix_millis(col(tsCol)) / lit(w)).cast("long").as("__w"))
        .agg(count(lit(1)).as("__c"))
        .filter(cmp(col("__c"), op, value))
        .select(col(userCol)).distinct()

    case SegmentCondition.DidEventCount(ev, filters, op, value, time) =>
      val pred = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate))
      timeScoped(events, time, reqTime, userCol, tsCol)
        .filter(pred).groupBy(col(userCol))
        .agg(count(lit(1)).as("__c"))
        .filter(cmp(col("__c"), op, value))
        .select(col(userCol))

    case SegmentCondition.DidEventAggregateProperty(ev, filters, prop, fn, op, value, time) =>
      val pred = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate))
      val agg = fn match {
        case AggFn.Count => count(col(prop))
        case AggFn.Sum   => sum(col(prop))
        case AggFn.Min   => min(col(prop))
        case AggFn.Max   => max(col(prop))
        case AggFn.Avg   => avg(col(prop))
        case other       => sys.error(s"unsupported segment agg $other")
      }
      timeScoped(events, time, reqTime, userCol, tsCol)
        .filter(pred).groupBy(col(userCol))
        .agg(agg.as("__a"))
        .filter(cmp(col("__a"), op, value))
        .select(col(userCol))

    case SegmentCondition.DidEventRelativeCount(ev, filters, otherEv, otherFilters, op, time) =>
      // count(A) OP count(B) per user, both counted in one pass over
      // the time scope with conditional aggregation — no second scan.
      val predA = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate))
      val predB = Exprs.and(
        otherEv.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          otherFilters.map(Exprs.propPredicate))
      timeScoped(events, time, reqTime, userCol, tsCol)
        .groupBy(col(userCol))
        .agg(
          count(when(predA, 1)).as("__a"),
          count(when(predB, 1)).as("__b"))
        .filter(cmpCols(col("__a"), op, col("__b")))
        .select(col(userCol))

    case SegmentCondition.HadPropertyValue(prop, op, values, time) =>
      val scoped = time.fold(events)(timeScoped(events, _, reqTime, userCol, tsCol))
      scoped.filter(Exprs.propPredicate(PropFilter(prop, op, values)))
        .select(col(userCol)).distinct()

    case SegmentCondition.HasPropertyValue(prop, op, values, versionCol) =>
      // CURRENT value = the user's latest row (replacing-table
      // semantics, dedup-on-read)
      Records.latestPerGroup(events, userCol, versionCol)
        .filter(Exprs.propPredicate(PropFilter(prop, op, values)))
        .select(col(userCol))
  }

  // ---------------------------------------------------------------
  // Fused membership flags: ALL segments' conditions in ONE
  // groupBy(user) pass. Each fusible condition becomes a boolean
  // aggregate expression (count/sum/min/max/avg over `when(pred, …)`
  // with its time scope folded into the predicate); per-segment
  // membership is then a plain boolean OR-of-ANDs over the condition
  // flags. The per-condition scan-and-intersect this replaces
  // multiplied the events scan by the number of conditions.
  // ---------------------------------------------------------------

  /** Conditions whose flag is expressible as a single per-user
    * aggregate. `Each` needs a per-window grouping key and
    * `AfterFirstUse` a first-event pre-pass — both fall back to
    * [[userSet]] and join into the flag frame. */
  private def fusible(c: SegmentCondition): Boolean = {
    def plainTime(t: SegmentTime) = t match {
      case _: SegmentTime.Each | _: SegmentTime.AfterFirstUse => false
      case _                                                  => true
    }
    c match {
      case SegmentCondition.DidEventCount(_, _, _, _, t)                => plainTime(t)
      case SegmentCondition.DidEventAggregateProperty(_, _, _, _, _, _, t) => plainTime(t)
      case SegmentCondition.DidEventRelativeCount(_, _, _, _, _, t)    => plainTime(t)
      case SegmentCondition.HadPropertyValue(_, _, _, t) =>
        t.forall(plainTime) // Each/AfterFirstUse scopes fall back
      case _: SegmentCondition.HasPropertyValue                         => true
    }
  }

  /** SegmentTime → row predicate (same bounds as [[timeScoped]]). */
  private def timePred(t: SegmentTime, reqTime: QueryTime, tsCol: String): Column = t match {
    case SegmentTime.Between(f, to) => col(tsCol) >= lit(f) && col(tsCol) <= lit(to)
    case SegmentTime.From(f)        => col(tsCol) >= lit(f)
    case SegmentTime.Last(n, unit) =>
      val to = reqTime match {
        case QueryTime.Between(_, t2)  => t2
        case QueryTime.Last(_, _, now) => now
        case QueryTime.From(_)         => new java.sql.Timestamp(Long.MaxValue / 2)
      }
      val from = new java.sql.Timestamp(to.getTime - n * unit.millis)
      col(tsCol) >= lit(from) && col(tsCol) <= lit(to)
    case other => sys.error(s"no row predicate for $other")
  }

  /** One fusible condition → boolean aggregate expression. */
  private def flagAgg(c: SegmentCondition, reqTime: QueryTime,
                      tsCol: String, eventCol: String): Column = c match {
    case SegmentCondition.DidEventCount(ev, filters, op, value, t) =>
      val g = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate) :+ timePred(t, reqTime, tsCol))
      // "did event": membership needs ≥1 matching row even for
      // zero-satisfiable comparisons (Lt/Neq) — same rows the
      // filter-then-group [[userSet]] path would keep
      count(when(g, 1)) > 0 && cmp(count(when(g, 1)), op, value)
    case SegmentCondition.DidEventAggregateProperty(ev, filters, prop, fn, op, value, t) =>
      val g = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate) :+ timePred(t, reqTime, tsCol))
      val guarded = when(g, col(prop))
      val agg = fn match {
        case AggFn.Count => count(guarded)
        case AggFn.Sum   => sum(guarded)
        case AggFn.Min   => min(guarded)
        case AggFn.Max   => max(guarded)
        case AggFn.Avg   => avg(guarded)
        case other       => sys.error(s"unsupported segment agg $other")
      }
      // ≥1 matching row required (count() yields 0, not null, for
      // zero rows, which would wrongly satisfy Lt/Lte/Neq)
      count(when(g, 1)) > 0 && cmp(agg, op, value)
    case SegmentCondition.DidEventRelativeCount(ev, filters, otherEv, otherFilters, op, t) =>
      val scope = timePred(t, reqTime, tsCol)
      val gA = Exprs.and(
        ev.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          filters.map(Exprs.propPredicate) :+ scope)
      val gB = Exprs.and(
        otherEv.map(Exprs.eventPredicate(col(eventCol), _)).toSeq ++
          otherFilters.map(Exprs.propPredicate) :+ scope)
      // user must appear in the condition's time scope at all — the
      // unfused path groups only time-scoped rows
      count(when(scope, 1)) > 0 &&
        cmpCols(count(when(gA, 1)), op, count(when(gB, 1)))
    case SegmentCondition.HadPropertyValue(prop, op, values, time) =>
      val g = Exprs.and(
        Seq(Exprs.propPredicate(PropFilter(prop, op, values))) ++
          time.map(timePred(_, reqTime, tsCol)))
      coalesce(bool_or(g), lit(false))
    case SegmentCondition.HasPropertyValue(prop, op, values, versionCol) =>
      // CURRENT value = value on the user's highest-version row
      Exprs.propPredicateOn(max_by(col(prop), col(versionCol)),
        PropFilter(prop, op, values))
  }

  /** The condition's row-level time scope predicate, when it has
    * one — used to prune the flag pass's scan to the union of scopes.
    * Derived from [[scopeTime]] so the ts predicate and the implied
    * [[dateScopePred]] date bounds can never disagree per condition
    * (the fused prefilter's soundness depends on exactly that
    * agreement). All-history conditions return None. */
  private def scopePred(c: SegmentCondition, reqTime: QueryTime,
                        tsCol: String): Option[Column] =
    scopeTime(c).map(timePred(_, reqTime, tsCol))

  /** The condition's RANGE-shaped time scope, when it has one (the
    * single source of truth behind [[scopePred]] and the fused pass's
    * date bounds). */
  private def scopeTime(c: SegmentCondition): Option[SegmentTime] = {
    def plain(t: SegmentTime): Option[SegmentTime] = t match {
      case _: SegmentTime.Each | _: SegmentTime.AfterFirstUse => None
      case t => Some(t)
    }
    c match {
      case SegmentCondition.DidEventCount(_, _, _, _, t)                   => plain(t)
      case SegmentCondition.DidEventAggregateProperty(_, _, _, _, _, _, t) => plain(t)
      case SegmentCondition.DidEventRelativeCount(_, _, _, _, _, t)        => plain(t)
      case SegmentCondition.HadPropertyValue(_, _, _, t)                   => t.flatMap(plain)
      case _                                                               => None
    }
  }

  /** All segments → (userCol, __seg_0 … __seg_{k-1}) membership
    * flags, computed in ONE aggregation over events for every fusible
    * condition; non-fusible conditions compute their [[userSet]]
    * separately and LEFT-join in as a flag. Only users belonging to
    * at least one segment survive. */
  def membershipFlags(
      events: DataFrame, segments: Seq[Segment], reqTime: QueryTime,
      userCol: String, tsCol: String, eventCol: String): DataFrame = {
    require(segments.nonEmpty, "membershipFlags needs segments")
    val conditions = segments.flatMap(_.conditions.flatten).distinct
    val condIdx = conditions.zipWithIndex.toMap
    val (fused, separate) = conditions.partition(fusible)
    // when EVERY fused condition carries a time bound AND there are no
    // non-fusible conditions, the flag scan prunes to the union of
    // those bounds (each flag still applies its own scope predicate).
    // A non-fusible condition disables the prune: its users LEFT-join
    // onto the base, so the base must keep every user with any event
    // or such users could never become members.
    val scopes = fused.map(scopePred(_, reqTime, tsCol))
    val events0 =
      if (fused.nonEmpty && separate.isEmpty && scopes.forall(_.isDefined)) {
        val tsOr = scopes.flatten.reduce(_ || _)
        // On the canonical date-partitioned layout, AND in the OR of
        // each scope's implied event_date bounds as a SEPARATE
        // conjunct: it references only the partition column, so
        // Catalyst extracts it as a PartitionFilter (a single OR
        // mixing ts and event_date would not decompose), and it is
        // implied by tsOr, so results are identical.
        val dateOr =
          if (events.columns.contains("event_date")) {
            val dps = fused.map(c => scopeTime(c).flatMap(
              dateScopePred(_, reqTime, col("event_date"))))
            if (dps.forall(_.isDefined)) Some(dps.flatten.reduce(_ || _)) else None
          } else None
        events.filter(dateOr.map(tsOr && _).getOrElse(tsOr))
      } else events
    val fusedAggs = fused.map(c =>
      flagAgg(c, reqTime, tsCol, eventCol).as(s"__c_${condIdx(c)}"))
    val base =
      if (fusedAggs.nonEmpty)
        events0.groupBy(col(userCol)).agg(fusedAggs.head, fusedAggs.tail: _*)
      else events.select(col(userCol)).distinct()
    val withAll = separate.foldLeft(base) { (acc, c) =>
      val name = s"__c_${condIdx(c)}"
      val us = userSet(events, c, reqTime, userCol, tsCol, eventCol)
        .withColumn(name, lit(true))
      acc.join(us, Seq(userCol), "left")
        .withColumn(name, coalesce(col(name), lit(false)))
    }
    val segCols = segments.zipWithIndex.map { case (s, i) =>
      s.conditions.map(conj =>
        conj.map(c => coalesce(col(s"__c_${condIdx(c)}"), lit(false))).reduce(_ && _))
        .reduce(_ || _).as(s"__seg_$i")
    }
    withAll.select(col(userCol) +: segCols: _*)
      .filter(segments.indices.map(i => col(s"__seg_$i")).reduce(_ || _))
  }

  /** OR of ANDs composition → one user-set (reference
    * planner/segment.rs And/Or). */
  def segmentUsers(
      events: DataFrame, seg: Segment, reqTime: QueryTime,
      userCol: String, tsCol: String, eventCol: String): DataFrame = {
    val ands = seg.conditions.map { conj =>
      conj.map(userSet(events, _, reqTime, userCol, tsCol, eventCol))
        .reduce(_.intersect(_))
    }
    ands.reduce(_.union(_)).distinct()
  }

  /** Restrict events to a segment's users — LEFT SEMI join, broadcast
    * by AQE when the user set is small. */
  def filterToSegment(
      events: DataFrame, seg: Segment, reqTime: QueryTime,
      userCol: String, tsCol: String, eventCol: String): DataFrame = {
    val users = segmentUsers(events, seg, reqTime, userCol, tsCol, eventCol)
    events.join(users, Seq(userCol), "left_semi")
  }
}
