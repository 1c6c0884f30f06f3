package graft

import graft.engine.{EventSegmentation, Funnel, Groups, Records}
import graft.model._
import graft.sources.Store
import org.apache.spark.sql.functions._

class TenancySpec extends SparkTestBase {

  private def twoProjectEvents() = {
    import spark.implicits._
    Seq(
      (1L, 1L, 1000L, "view", 1.0, 10L),
      (1L, 2L, 2000L, "click", 2.0, 10L),
      (2L, 3L, 3000L, "view", 3.0, 10L),
      (9L, 4L, 4000L, "view", 9.0, 20L),
      (9L, 5L, 5000L, "click", 9.0, 20L))
      .toDF("user_id", "event_id", "ts_ms", "event_type", "value", "project_id")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
  }

  private val allTime = QueryTime.Between(
    new java.sql.Timestamp(0L), new java.sql.Timestamp(86400000L))

  test("every query path scopes to the requested project") {
    val df = twoProjectEvents()
    val es = EventSegmentation.run(df, EventSegmentationRequest(
      time = allTime, interval = TimeIntervalUnit.Day,
      events = Seq(EventBlock(None, queries = Seq(NamedQuery(Query.CountEvents, "cnt")))),
      projectId = Some(10L)))
    assert(es.agg(sum("cnt")).collect()(0).getLong(0) == 3L)

    val fu = Funnel.run(spark, df, Funnel.Request(
      steps = Seq(col("event_type") === "view", col("event_type") === "click"),
      windowMs = Long.MaxValue / 4000L, projectId = Some(10L)))
      .select("step", "total").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fu == Map(1 -> 2L, 2 -> 1L)) // project 20's instant funnel excluded

    val rec = Records.searchEvents(df, allTime, projectId = Some(20L))
    assert(rec.count() == 2L)

    val prof = Groups.buildProfiles(df, "user_id", Seq("value"), projectId = Some(20L))
    assert(prof.select("user_id").collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("funnel segment membership never sees other projects' events") {
    val df = twoProjectEvents()
    // user 9 clicks only in project 20; a project-10 funnel segmented
    // on "did click" must exclude them even though they view in 20
    val json = """{
      "time": {"type": "between", "from": "1970-01-01T00:00:00Z", "to": "1970-01-02T00:00:00Z"},
      "projectId": 10,
      "steps": [{"events": [{"eventType": "regular", "eventName": "view"}], "order": {"type": "exact"}}],
      "timeWindow": {"n": 1, "unit": "day"},
      "segments": [{"name": "clickers", "conditions": [[
        {"type": "didEvent", "eventType": "regular", "eventName": "click",
         "aggregate": {"type": "count", "operation": "gte", "value": 1,
                       "time": {"type": "from", "from": "1970-01-01T00:00:00Z"}}}]]}]
    }"""
    val out = graft.engine.JsonApi.funnel(spark, df, json)
      .select("step", "total").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L)) // only user 1 (clicked in project 10)
  }

  test("project scope is vacuous on single-project stores (no column)") {
    val df = twoProjectEvents().drop("project_id")
    val es = EventSegmentation.run(df, EventSegmentationRequest(
      time = allTime, interval = TimeIntervalUnit.Day,
      events = Seq(EventBlock(None, queries = Seq(NamedQuery(Query.CountEvents, "cnt")))),
      projectId = Some(10L)))
    assert(es.agg(sum("cnt")).collect()(0).getLong(0) == 5L)
  }

  test("Store layout turns the tenant predicate into partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tenancy").toString
    Store.writeEvents(twoProjectEvents(), dir)
    val read = Store.readEvents(spark, dir)
    val scoped = graft.engine.Exprs.tenantScope(read, Some(10L))
    assert(scoped.count() == 3L)
    // the predicate lands on the partition column → directory pruning
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("project_id"))
  }
}
