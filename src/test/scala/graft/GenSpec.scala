package graft

import graft.gen.EventsGen
import org.apache.spark.sql.functions._

/** Demo-data generator semantics (reference events-gen crate). */
class GenSpec extends SparkTestBase {

  test("generation is deterministic and independent of partitioning") {
    val a = EventsGen.generate(spark, 50).orderBy("user_id", "session", "event_type")
      .collect().toSeq
    val b = EventsGen.generate(spark, 50).repartition(7)
      .orderBy("user_id", "session", "event_type").collect().toSeq
    assert(a == b)
  }

  test("every session follows the view -> click -> purchase cascade") {
    val counts = EventsGen.generate(spark, 200)
      .groupBy("user_id", "session")
      .agg(
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      .collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val (v, c, p) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(v == 1, "exactly one view per session")
      assert(c <= v && p <= c, "funnel shape: view >= click >= purchase")
    }
  }

  test("session counts stay in [1, maxSessions] and draws in range") {
    val g = EventsGen.generate(spark, 100, maxSessions = 3, nProducts = 10)
    val r = g.agg(
      max(col("session")).as("max_s"),
      min(col("product_id")).as("min_p"), max(col("product_id")).as("max_p"),
      min(col("ts_us")).as("min_t")).collect()(0)
    assert(r.getLong(0) <= 2)
    assert(r.getLong(1) >= 0 && r.getLong(2) <= 9)
    // all timestamps inside [2024-01-01, 2024-01-31 + 2min)
    assert(r.getLong(3) >= 1704067200000000L)
  }

  test("only purchases carry a price") {
    val g = EventsGen.generate(spark, 100)
    assert(g.filter(col("event_type") =!= "purchase" && col("vcents").isNotNull).count() == 0)
    assert(g.filter(col("event_type") === "purchase" && col("vcents").isNull).count() == 0)
  }
}
