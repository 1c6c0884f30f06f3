package graft

import graft.engine.{Exprs, Tables}
import graft.model.QueryTime
import org.apache.spark.sql.functions._

/** The ns-long time-filter pushdown rule must (a) produce pushable raw
  * predicates and (b) never change results. */
class PushdownSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("time filter reaches the parquet scan as raw ns bounds") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val filtered = ev.filter(Exprs.timePredicate(col("ts"),
      QueryTime.Between(ts("2024-01-05T00:00:00Z"), ts("2024-01-10T00:00:00Z"))))
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThanOrEqual(ts,1704412800000000000)"), scan)
    assert(scan.contains("LessThanOrEqual(ts,1704844800000000999)"), scan)
  }

  test("pushdown conjuncts do not change results at boundaries") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // count with the optimizer rule active vs a manually-computed
    // count over the raw ns column (ground truth)
    val from = ts("2024-01-05T00:00:00Z"); val to = ts("2024-01-10T00:00:00Z")
    val n1 = ev.filter(Exprs.timePredicate(col("ts"), QueryTime.Between(from, to))).count()
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // ts(µs) <= to ⇔ ns <= (to_ms*1000)*1000 + 999
    val n2 = raw.filter(
      col("ts") >= lit(from.getTime) * 1000000L &&
        col("ts") <= lit(to.getTime) * 1000000L + 999L).count()
    assert(n1 == n2)
  }
}
