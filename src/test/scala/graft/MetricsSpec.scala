package graft

import graft.engine.{JsonApi, Metrics}

/** Per-request metrics (reference common/src/types.rs:114-115
  * counter + histogram, recorded in each handler). */
class MetricsSpec extends SparkTestBase {

  test("timed records counts, wall time, max and failures per tag") {
    Metrics.reset()
    Metrics.timed("t") { Thread.sleep(5) }
    Metrics.timed("t") { Thread.sleep(1) }
    intercept[RuntimeException] {
      Metrics.timed("t") { throw new RuntimeException("boom") }
    }
    Metrics.timed("other") { () }
    val s = Metrics.snapshot
    val t = s("t")
    assert(t.queries == 3 && t.failures == 1)
    assert(t.totalSeconds >= 0.006 && t.maxSeconds >= 0.005)
    assert(t.maxSeconds <= t.totalSeconds)
    assert(s("other").queries == 1 && s("other").failures == 0)
  }

  test("JSON response entry points record under the reference's tags") {
    Metrics.reset()
    val df = eventsDf(Seq((1L, 1000L, "view", "ios", 1.0)))
    JsonApi.eventSegmentationJson(df, """{
      "time": {"type": "between", "from": "1970-01-01T00:00:00Z", "to": "1970-01-02T00:00:00Z"},
      "intervalUnit": "day",
      "events": [{"eventType": "regular", "eventName": "view",
                  "queries": [{"type": "countEvents", "name": "cnt"}]}]
    }""")
    val s = Metrics.snapshot
    assert(s("event_segmentation").queries == 1)
    assert(s("event_segmentation").totalSeconds > 0)
  }
}
