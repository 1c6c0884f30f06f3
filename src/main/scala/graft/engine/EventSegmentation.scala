package graft.engine

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event segmentation: the Spark build of the reference's flagship
  * query (reference query/src/event_segmentation.rs:245-454 assembles a
  * 14-node plan: Segment inputs → Filter → PartitionedAggregatePartial/
  * Final → Unpivot → Pivot → RenameColumnRows → AggregateAndSortColumns
  * → LimitGroups → Merge → ReorderColumns → RenameColumns).
  *
  * Here the whole pipeline is declarative DataFrame ops: one
  * `groupBy(bucket, breakdowns).agg(...)` per event block (per
  * segment), unioned with `unionByName`. Spark's partial/final
  * aggregation replaces the reference's two-node split, and the
  * shuffle on the group keys replaces its single-partition
  * "HashPartitioned(project, user)" declared-but-unused distribution
  * (reference segmented_aggregate.rs:227-251).
  *
  * Scale notes (100 TB): one-level metrics are a single shuffle with
  * map-side combine. Two-level (per-user) metrics shuffle once on
  * (bucket, breakdowns, user) — high cardinality, so it parallelizes —
  * then re-aggregate the (much smaller) per-user partials; AQE
  * coalesces the second exchange.
  */
object EventSegmentation {

  val TsCol = "ts"
  val UserCol = "user_id"
  val EventCol = "event_type"

  /** Compile one metric into either a one-level agg Column or the
    * (inner, outer) pair of a two-level per-user agg. */
  private def aggFn(fn: AggFn, c: Column): Column = fn match {
    case AggFn.Count          => count(c)
    case AggFn.Sum            => sum(c)
    case AggFn.Min            => min(c)
    case AggFn.Max            => max(c)
    case AggFn.Avg            => avg(c)
    case AggFn.Median         => median(c)
    case AggFn.Percentile(p)  => percentile_approx(c, lit(p), lit(10000))
    case AggFn.DistinctCount  => count_distinct(c)
    case AggFn.ApproxDistinctCount(rsd) => approx_count_distinct(c, rsd)
  }

  private final case class Compiled(
      oneLevel: Seq[Column],          // aggs usable directly
      inner: Seq[Column],             // per-user pre-aggs
      outer: Seq[Column])             // over per-user rows

  /** True if any metric needs the per-user inner pass. */
  private def needsInner(qs: Seq[NamedQuery]): Boolean = qs.exists {
    case NamedQuery(_: Query.CountPerGroup, _)             => true
    case NamedQuery(_: Query.AggregatePropertyPerGroup, _) => true
    case NamedQuery(Query.CountUniqueGroups(_), _)         => false
    case _                                                 => false
  }

  /** Formula metrics evaluate after aggregation, over the other named
    * metric columns (reference QueryFormula — unimplemented there). */
  private def applyFormulas(df: DataFrame, qs: Seq[NamedQuery]): DataFrame =
    qs.foldLeft(df) {
      case (acc, NamedQuery(Query.Formula(e), n)) => acc.withColumn(n, expr(e))
      case (acc, _)                               => acc
    }

  private def compile(qs: Seq[NamedQuery], groupCol: String): Compiled = {
    val one = qs.map {
      case NamedQuery(Query.CountEvents, n)             => count(lit(1)).as(n)
      case NamedQuery(Query.CountUniqueGroups(_), n)    => count_distinct(col(groupCol)).as(n)
      case NamedQuery(Query.AggregateProperty(p, f), n) => aggFn(f, col(p)).as(n)
      case NamedQuery(q, n) => sys.error(s"two-level metric $q/$n in one-level path")
    }
    Compiled(one, Nil, Nil)
  }

  /** Two-level compile: every metric is computed from one shared
    * per-user inner aggregation (reference evaluates all metrics in a
    * single pass over user-sorted input — expressions/aggregate/partitioned). */
  private def compileTwoLevel(qs: Seq[NamedQuery]): Compiled = {
    val inner = scala.collection.mutable.LinkedHashMap[String, Column]()
    def innerCol(key: String, c: => Column): Column = {
      inner.getOrElseUpdate(key, c.as(key)); col(key)
    }
    val outer = qs.map {
      case NamedQuery(Query.CountEvents, n) =>
        sum(innerCol("__cnt", count(lit(1)))).as(n)
      case NamedQuery(Query.CountUniqueGroups(_), n) =>
        count(lit(1)).as(n) // one inner row per user
      case NamedQuery(Query.AggregateProperty(p, f), n) => f match {
        case AggFn.Count => sum(innerCol(s"__cnt_$p", count(col(p)))).as(n)
        case AggFn.Sum   => sum(innerCol(s"__sum_$p", sum(col(p)))).as(n)
        case AggFn.Min   => min(innerCol(s"__min_$p", min(col(p)))).as(n)
        case AggFn.Max   => max(innerCol(s"__max_$p", max(col(p)))).as(n)
        case AggFn.Avg   =>
          (sum(innerCol(s"__sum_$p", sum(col(p)))) /
            sum(innerCol(s"__cntnn_$p", count(col(p))))).as(n)
        case other => sys.error(s"outer-level $other over raw rows unsupported in mixed mode")
      }
      case NamedQuery(Query.CountPerGroup(outerFn), n) =>
        aggFn(outerFn, innerCol("__cnt", count(lit(1)))).as(n)
      case NamedQuery(Query.AggregatePropertyPerGroup(p, innerFn, outerFn), n) =>
        aggFn(outerFn, innerCol(s"__i_${p}_$innerFn", aggFn(innerFn, col(p)))).as(n)
    }
    Compiled(Nil, inner.values.toSeq, outer)
  }

  /** One event block → long-form frame
    * (bucket, breakdowns..., metrics...). */
  def eventFrame(
      events: DataFrame,
      req: EventSegmentationRequest,
      block: EventBlock): DataFrame = {
    val preds =
      Seq(Exprs.timePredicate(col(TsCol), req.time)) ++
        block.eventName.map(Exprs.eventPredicate(col(EventCol), _)).toSeq ++
        block.customEvent.map(Exprs.customEventPredicate(col(EventCol), _)).toSeq ++
        (req.filters ++ block.filters).map(Exprs.propPredicate)
    val filtered = events.filter(Exprs.and(preds))
    val bucketCol = Exprs.bucket(col(TsCol), req.interval).as("bucket")
    val bds = (req.breakdowns ++ block.breakdowns).distinct.map(col)
    val keys = bucketCol +: bds

    val aggQs = block.queries.filterNot(_.query.isInstanceOf[Query.Formula])
    val aggregated = if (needsInner(aggQs)) {
      val c = compileTwoLevel(aggQs)
      filtered
        .groupBy((keys :+ col(req.groupCol)): _*)
        .agg(c.inner.head, c.inner.tail: _*)
        .groupBy(col("bucket") +: bds.map(b => col(b.toString())): _*)
        .agg(c.outer.head, c.outer.tail: _*)
    } else {
      val c = compile(aggQs, req.groupCol)
      filtered.groupBy(keys: _*).agg(c.oneLevel.head, c.oneLevel.tail: _*)
    }
    applyFormulas(aggregated, block.queries)
  }

  /** Request normalization (reference `fix_request`,
    * query/src/event_segmentation.rs:962-997 and
    * platform/src/event_segmentation.rs:45-95): blocks without metrics
    * default to CountEvents, breakdowns deduplicate, segments
    * deduplicate by name. */
  def fixRequest(req: EventSegmentationRequest): EventSegmentationRequest = {
    val fixedBlocks = req.events.map { b =>
      val qs = if (b.queries.isEmpty)
        Seq(NamedQuery(Query.CountEvents, "count")) else b.queries
      b.copy(queries = qs, breakdowns = b.breakdowns.distinct)
    }
    req.copy(
      events = fixedBlocks,
      breakdowns = req.breakdowns.distinct,
      segments = req.segments
        .groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name))
  }

  /** Full request → long-form result:
    * (segment, event, bucket, breakdowns..., metrics...).
    * Multi-event blocks union by name with missing metric columns null
    * — the Spark analog of the reference's schema-merging MergeNode
    * (reference query/src/logical_plan/merge.rs:21). */
  def run(events: DataFrame, req: EventSegmentationRequest): DataFrame = {
    val segmented: Seq[(String, DataFrame)] =
      if (req.segments.isEmpty) Seq(("all", events))
      else req.segments.map { s =>
        (s.name, Segments.filterToSegment(events, s, req.time, req.groupCol, TsCol, EventCol))
      }
    val frames = for {
      (segName, segEvents) <- segmented
      block <- req.events
    } yield eventFrame(segEvents, req, block)
      .withColumn("event", lit(block.customEvent.map(_.name)
        .orElse(block.eventName).getOrElse("all")))
      .withColumn("segment", lit(segName))
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Materialized time range of a request (for the precomputed pivot
    * bucket list — reference common/src/query.rs:464-518). */
  def timeRange(t: QueryTime): (java.sql.Timestamp, java.sql.Timestamp) = t match {
    case QueryTime.Between(f, to)   => (f, to)
    case QueryTime.Last(n, u, now)  => (new java.sql.Timestamp(now.getTime - n * u.millis), now)
    case QueryTime.From(f)          => (f, f) // unbounded: single bucket
  }

  /** The reference's Regular output format (§3.1 plan tail): long-form
    * metrics are melted to (agg_name, value), pivoted over the
    * PRECOMPUTED bucket list of the query range (missing buckets
    * appear as null columns), a row-average column is appended, rows
    * sort by it, and only the top-k group tuples survive
    * (reference Unpivot → Pivot → AggregateAndSortColumns →
    * LimitGroups(50) → ReorderColumns, event_segmentation.rs:630-730). */
  def runPivoted(events: DataFrame, req: EventSegmentationRequest,
                 topGroups: Int = 50): DataFrame = {
    val long = run(events, req)
    val bds = (req.breakdowns ++ req.events.flatMap(_.breakdowns)).distinct
    val idCols = Seq("segment", "event") ++ bds
    val metricCols = long.columns.toSeq.diff(idCols :+ "bucket")
    val melted = Reshape.unpivot(long, idCols :+ "bucket", metricCols)
    val (from, to) = timeRange(req.time)
    val buckets = Reshape.timeColumns(from, to, req.interval)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val bucketNames = buckets.map(b => fmt.format(b.toInstant))
    val wide = Reshape.pivot(
      melted.withColumn("__b", date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss")),
      idCols :+ "agg_name", "__b", bucketNames, "value")
    val sorted = Reshape.aggregateAndSortColumns(wide, bucketNames)
    val limited =
      if (bds.isEmpty) sorted
      else Reshape.limitGroups(sorted, bds, "average", topGroups)
    Reshape.reorderColumns(limited, idCols :+ "agg_name")
  }

  /** Rolling n-day active groups (the reference declares
    * Weekly/MonthlyActiveGroups and leaves them unimplemented!(),
    * event_segmentation.rs:641-650). Each event contributes its group
    * id to the n daily windows that cover it (row amplification ×n),
    * then one distinct-count per day — no per-day rescan, scales as a
    * single shuffle on (day, group). */
  def rollingActiveGroups(events: DataFrame, windowDays: Int,
                          from: java.sql.Timestamp, to: java.sql.Timestamp,
                          groupCol: String = UserCol, tsCol: String = TsCol,
                          outCol: String = "active"): DataFrame = {
    events
      .filter(col(tsCol) >= lit(from) && col(tsCol) <= lit(to))
      .select(col(groupCol),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__i"),
        to_date(date_trunc("day", col(tsCol))).as("__d0"))
      .select(col(groupCol), date_add(col("__d0"), col("__i")).as("d"))
      .filter(col("d") <= to_date(lit(to)))
      .groupBy(col("d"))
      .agg(count_distinct(col(groupCol)).as(outCol))
  }
}
