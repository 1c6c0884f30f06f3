package graft

import graft.engine.{Exprs, Tables}
import graft.model.QueryTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time filters must reach the parquet scan as pushed predicates —
  * natively when the fixture carries a real timestamp column, and via
  * graft.plans.NsTimeFilterPushdown when the source stores raw ns
  * longs (TIMESTAMP(NANOS) parquet read with nanosAsLong). Either way
  * the filter must never change results at window boundaries. */
class PushdownSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  private def leafScan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().head.toString

  test("time filter reaches the parquet scan as pushed bounds") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val filtered = ev.filter(Exprs.timePredicate(col("ts"),
      QueryTime.Between(ts("2024-01-05T00:00:00Z"), ts("2024-01-10T00:00:00Z"))))
    val scan = leafScan(filtered)
    // Both bounds must appear under PushedFilters, whatever the
    // physical encoding of ts (native timestamp vs raw ns long).
    val pushed = scan.split("PushedFilters:").lift(1).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts,"), scan)
    assert(pushed.contains("LessThanOrEqual(ts,"), scan)
  }

  test("ns-long sources get raw ns bounds via NsTimeFilterPushdown") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nspush").toString
    // A raw ns-long ts column, as Tables.events sees TIMESTAMP(NANOS)
    // parquet under spark.sql.legacy.parquet.nanosAsLong.
    val base = 1704412800000000000L // 2024-01-05T00:00:00Z in ns
    (0L until 64L).map(i => (i, base + i * 3600L * 1000000000L))
      .toDF("event_id", "ts").write.mode("overwrite").parquet(dir)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NsTimeFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NsTimeFilterPushdown
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == LongType)
    val ev = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val filtered = ev.filter(Exprs.timePredicate(col("ts"),
      QueryTime.Between(ts("2024-01-05T12:00:00Z"), ts("2024-01-06T12:00:00Z"))))
    val scan = leafScan(filtered)
    assert(scan.contains("GreaterThanOrEqual(ts,1704456000000000000)"), scan)
    assert(scan.contains("LessThanOrEqual(ts,1704542400000000999)"), scan)
    assert(filtered.count() == 25L) // 12:00 .. 12:00 next day, hourly
  }

  test("pushdown conjuncts do not change results at boundaries") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val from = ts("2024-01-05T00:00:00Z"); val to = ts("2024-01-10T00:00:00Z")
    val n1 = ev.filter(Exprs.timePredicate(col("ts"), QueryTime.Between(from, to))).count()
    // Ground truth straight off the raw file, predicate matched to the
    // physical ts encoding.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val n2 = (raw.schema("ts").dataType match {
      case LongType =>
        // ts(µs) <= to ⇔ ns <= (to_ms*1000)*1000 + 999
        raw.filter(col("ts") >= lit(from.getTime * 1000000L) &&
          col("ts") <= lit(to.getTime * 1000000L + 999L))
      case _ =>
        raw.filter(col("ts") >= lit(from) && col("ts") <= lit(to))
    }).count()
    assert(n1 == n2)
  }
}
