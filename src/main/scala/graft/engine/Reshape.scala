package graft.engine

import graft.model.TimeIntervalUnit
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Output-reshaping operators — the Spark build of the reference's
  * thin custom nodes (SURVEY.md §2.10): Merge, Unpivot, Pivot,
  * AddStringColumn, RenameColumns, RenameColumnRows, ReorderColumns,
  * AggregateAndSortColumns, LimitGroups. All are driver-cheap
  * DataFrame combinators; none require Catalyst extensions.
  */
object Reshape {

  /** n-ary schema-merging UNION ALL with optional tag column
    * (reference query/src/logical_plan/merge.rs:21 — Schema::try_merge,
    * missing columns → null). */
  def merge(frames: Seq[(String, DataFrame)], tagCol: Option[String]): DataFrame = {
    val tagged = tagCol match {
      case Some(t) => frames.map { case (name, df) => df.withColumn(t, lit(name)) }
      case None    => frames.map(_._2)
    }
    tagged.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Melt metric columns → (agg_name, value) long form (reference
    * logical_plan/unpivot.rs:22-67; every value cast to a common
    * numeric type — reference uses Decimal128(28,16), we use double). */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              nameCol: String = "agg_name", valueColName: String = "value"): DataFrame = {
    val ids = idCols.map(col)
    val vals = valueCols.map(c => col(c).cast("double").as(c))
    df.select((ids ++ vals): _*)
      .unpivot(ids.toArray, valueCols.map(col).toArray, nameCol, valueColName)
  }

  /** Pivot long → wide over a PRECOMPUTED column list (reference
    * logical_plan/pivot.rs:21-77 — result columns come from the query
    * time range, not the data, so empty buckets still appear). */
  def pivot(df: DataFrame, groupCols: Seq[String], pivotCol: String,
            pivotValues: Seq[Any], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(first(col(valueCol)))

  /** The reference's `time_columns` (common/src/query.rs:464-518):
    * the list of bucket timestamps covering [from, to] at `interval`,
    * precomputed so the pivoted result has a column per bucket even
    * when no data lands in it. */
  def timeColumns(from: Timestamp, to: Timestamp, unit: TimeIntervalUnit): Seq[Timestamp] = {
    val zone = java.time.ZoneOffset.UTC
    def trunc(t: Timestamp): java.time.ZonedDateTime = {
      val z = t.toInstant.atZone(zone)
      unit match {
        case TimeIntervalUnit.Second => z.withNano(0)
        case TimeIntervalUnit.Minute => z.withNano(0).withSecond(0)
        case TimeIntervalUnit.Hour   => z.withNano(0).withSecond(0).withMinute(0)
        case TimeIntervalUnit.Day    => z.toLocalDate.atStartOfDay(zone)
        case TimeIntervalUnit.Week   => // Monday start, matching date_trunc('week')
          z.toLocalDate.`with`(java.time.DayOfWeek.MONDAY).atStartOfDay(zone)
        case TimeIntervalUnit.Month  => z.toLocalDate.withDayOfMonth(1).atStartOfDay(zone)
        case TimeIntervalUnit.Year   => z.toLocalDate.withDayOfYear(1).atStartOfDay(zone)
      }
    }
    def next(z: java.time.ZonedDateTime): java.time.ZonedDateTime = unit match {
      case TimeIntervalUnit.Second => z.plusSeconds(1)
      case TimeIntervalUnit.Minute => z.plusMinutes(1)
      case TimeIntervalUnit.Hour   => z.plusHours(1)
      case TimeIntervalUnit.Day    => z.plusDays(1)
      case TimeIntervalUnit.Week   => z.plusWeeks(1)
      case TimeIntervalUnit.Month  => z.plusMonths(1)
      case TimeIntervalUnit.Year   => z.plusYears(1)
    }
    val end = trunc(to)
    Iterator.iterate(trunc(from))(next).takeWhile(!_.isAfter(end))
      .map(z => Timestamp.from(z.toInstant)).toSeq
  }

  /** Prepend a constant string column (reference
    * logical_plan/add_string_column.rs). */
  def addStringColumn(df: DataFrame, name: String, value: String): DataFrame =
    df.select(lit(value).as(name) +: df.columns.map(col).toSeq: _*)

  /** Physical → display names, de-duplicating as "Name 2", "Name 3"
    * (reference event_records.rs:395-413). */
  def renameColumns(df: DataFrame, mapping: Seq[(String, String)]): DataFrame = {
    val seen = scala.collection.mutable.Map[String, Int]()
    val cols = df.columns.map { c =>
      val want = mapping.collectFirst { case (`c`, d) => d }.getOrElse(c)
      val n = seen.getOrElse(want, 0) + 1
      seen(want) = n
      col(c).as(if (n == 1) want else s"$want $n")
    }
    df.select(cols.toSeq: _*)
  }

  /** Value-level rename inside a column (reference
    * logical_plan/rename_column_rows.rs) — a when-chain. */
  def renameColumnRows(df: DataFrame, column: String, mapping: Map[String, String]): DataFrame = {
    val c = mapping.foldLeft(col(column)) { case (acc, (from, to)) =>
      when(col(column) === lit(from), lit(to)).otherwise(acc)
    }
    df.withColumn(column, c)
  }

  /** Put the given columns first (reference
    * logical_plan/reorder_columns.rs). */
  def reorderColumns(df: DataFrame, first: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(first.contains)
    df.select((first ++ rest).map(col): _*)
  }

  /** Row-wise average of all metric columns appended + sort desc by it
    * (reference physical_plan/aggregate_and_sort_columns.rs:41-199). */
  def aggregateAndSortColumns(df: DataFrame, metricCols: Seq[String],
                              avgCol: String = "average"): DataFrame = {
    val n = metricCols.size
    val sumExpr = metricCols.map(c => coalesce(col(c).cast("double"), lit(0.0))).reduce(_ + _)
    df.withColumn(avgCol, sumExpr / lit(n)).orderBy(col(avgCol).desc)
  }

  /** Top-k distinct group tuples: keep rows whose group tuple ranks in
    * the first `k` by `orderCol` desc (reference
    * logical_plan/limit_groups.rs — first-k-seen post-sort ⇒ top-k
    * groups). Implemented shuffle-light: distinct group tuples are
    * tiny after aggregation, so the rank side broadcast-joins back. */
  def limitGroups(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int): DataFrame = {
    val top = df.groupBy(groupCols.map(col): _*)
      .agg(max(col(orderCol)).as("__o"))
      .orderBy(col("__o").desc +: groupCols.map(c => col(c).asc): _*)
      .limit(k)
      .select(groupCols.map(col): _*)
    df.join(broadcast(top), groupCols, "left_semi")
  }
}
