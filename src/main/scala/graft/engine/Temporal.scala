package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference surface: point-in-time
  * (as-of) join and cohort retention. The reference stops at funnels
  * and segmentation (its `Cohort` segment variant is commented out,
  * platform/src/lib.rs:514); these are the two temporal shapes a
  * training-data / product-analytics pipeline asks for next, built
  * the way they must be built at 100 TB:
  *
  *  - as-of join as ONE hash shuffle + sort per side-union (the same
  *    exchange a sort-merge join would pay) with a linear running
  *    window — never a range cross-product, never a per-row probe;
  *  - retention as aggregates over a (user, period)-reduced frame, so
  *    everything after the first map-side-combined shuffle is tiny.
  */
object Temporal {

  /** Point-in-time join: for every left row, the single latest right
    * row with the same `keys` and `right(rightTs) <= left(leftTs)`
    * (at-or-before, inclusive), optionally within `tolerance` time
    * units. Appends the matched right payload columns (every right
    * column that is not a key and not `rightTs`) plus the matched
    * right time as `asof_ts`; all null when no match.
    *
    * Mechanics: tag both sides, union, and take ONE running
    * `last(struct(asof_ts, payload…), ignoreNulls)` over
    * (keys | order by time, side, tieBreak) — the struct is null
    * exactly on left rows, so the whole match comes from a single
    * right row and individual right payload values may legitimately
    * be null (a per-column last would let a null value see through to
    * an older right row). Right rows sort before left rows at equal
    * time, so an update at exactly t is visible to an event at t.
    *
    * Determinism: when several right rows share (keys, time), the
    * winner is the greatest by `tieBreak` (required non-empty if such
    * ties are possible — ordering among identical sort keys is
    * otherwise plan-dependent). The DuckDB oracle replays the same
    * union-window with ONE struct-valued `last_value(CASE WHEN side=0
    * THEN struct_pack(...) END IGNORE NULLS)` and the same ORDER BY —
    * the same whole-row semantics as the engine's `last(struct(...))`,
    * so ties AND null payload values resolve identically (a
    * per-column oracle would let a null payload fall through to an
    * older right row where the engine keeps it null).
    *
    * Scale: the plan is Exchange(hashpartitioning(keys)) + Sort +
    * Window + Filter — the minimum any co-grouped temporal join pays.
    * No broadcast requirement on either side, no interval explosion;
    * skew follows the entity key exactly like every per-user operator
    * here.
    *
    * Both time columns must be numeric (epoch µs by convention —
    * `unix_micros` upstream): ordering and the tolerance arithmetic
    * stay exact and engine-portable, and null times must be filtered
    * upstream (Spark sorts nulls first, DuckDB last).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[Long] = None,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val collide = (payload :+ "asof_ts").toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"right payload collides with left columns: $collide")
    val leftRest = left.columns.filterNot(keys.contains).toSeq

    // Union schema: keys ++ leftRest ++ (asof_ts +: payload) ++ (__t, __side)
    val l2 = left.select(
      keys.map(col) ++
        leftRest.map(col) ++
        ((rightTs +: payload).map(c =>
          lit(null).cast(right.schema(c).dataType).as(asofName(c, rightTs)))) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side")): _*)
    val r2 = right.select(
      keys.map(col) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        ((rightTs +: payload).map(c => col(c).as(asofName(c, rightTs)))) ++
        Seq(col(rightTs).as("__t"), lit(0).as("__side")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col("__t") +: col("__side") +: tieBreak.map(c => col(asofName(c, rightTs)))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols = (rightTs +: payload).map(asofName(_, rightTs))
    // ONE last() over a per-right-row struct (null on left rows), not
    // one last() per column: per-column lasts let a legitimately-null
    // right payload value 'see through' to an OLDER right row, mixing
    // two right rows in one output row. The struct is null exactly on
    // left rows (when-without-otherwise), so ignoreNulls picks the
    // entire latest right row wholesale and null payload values are
    // safe.
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(
        when(col("__side") === 0, struct(outCols.map(col): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // Tolerance cut: a match older than (leftTs - tolerance) is no match.
    val keep = tolerance match {
      case Some(tol) => col("__m").isNotNull &&
        col("__m").getField("asof_ts") >= col("__t") - lit(tol)
      case None      => col("__m").isNotNull
    }
    matched.select(
      keys.map(col) ++ leftRest.map(col) ++
        outCols.map(c => when(keep, col("__m").getField(c)).as(c)): _*)
  }

  private def asofName(c: String, rightTs: String): String =
    if (c == rightTs) "asof_ts" else c

  /** Weekly cohort retention: users grouped by the Monday week of
    * their first activity; one output row per (cohort_week,
    * week_offset) with the count of cohort users active that week,
    * offsets 0..maxWeeks.
    *
    * Shape for scale: the raw stream reduces to distinct
    * (user, week) pairs first — a map-side-combined shuffle that
    * collapses 100 TB of events to |users|×|weeks| rows — then one
    * groupBy(user) carrying the ≤|weeks| distinct weeks per user (no
    * sort, bounded list), then a tiny final aggregate. No join back
    * against the raw stream.
    */
  def weeklyRetention(
      ev: DataFrame,
      userCol: String,
      tsCol: String,
      maxWeeks: Int): DataFrame = {
    val uw = ev
      .select(col(userCol).as("__u"), to_date(date_trunc("week", col(tsCol))).as("__w"))
      .distinct()
    uw.groupBy(col("__u"))
      .agg(min(col("__w")).as("cohort_week"), collect_list(col("__w")).as("__ws"))
      .select(col("cohort_week"), explode(col("__ws")).as("__w"))
      .select(col("cohort_week"),
        (datediff(col("__w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
