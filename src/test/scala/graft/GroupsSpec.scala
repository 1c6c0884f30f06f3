package graft

import graft.engine.Groups
import graft.model.{PropFilter, PropOp}
import org.apache.spark.sql.functions._

class GroupsSpec extends SparkTestBase {

  private def ev(rows: Seq[(Long, Long, Long, String, java.lang.Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts_ms", "plan", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
  }

  test("profile carries the last SET value per property; nulls don't overwrite") {
    val df = ev(Seq(
      (1L, 1L, 1000L, "free", 5.0),
      (1L, 2L, 2000L, "pro", null),   // value null → keeps 5.0
      (1L, 3L, 3000L, null, 7.0),     // plan null → keeps "pro"
      (2L, 4L, 4000L, "free", 1.0)))
    val p = Groups.buildProfiles(df, "user_id", Seq("plan", "value"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("plan"), r.getAs[Double]("value"),
          r.getAs[Long]("version"), r.getAs[Long]("n_events")))).toMap
    assert(p(1L) == (("pro", 7.0, 3L, 3L)))
    assert(p(2L) == (("free", 1.0, 4L, 1L)))
  }

  test("search filters, sorts with id tiebreak, and limits") {
    val df = ev(Seq(
      (1L, 1L, 1000L, "a", 5.0), (2L, 2L, 2000L, "b", 9.0),
      (3L, 3L, 3000L, "c", 9.0), (4L, 4L, 4000L, "d", 1.0)))
    val profiles = Groups.buildProfiles(df, "user_id", Seq("plan", "value"))
    val out = Groups.search(profiles, Some(col("value") > 1.0),
      Seq(("value", false)), "user_id", 2)
      .select("user_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 3L)) // 9.0 ties break by id; 5.0 cut by limit
  }

  test("hasPropertyValue over the profile table returns current matches") {
    val df = ev(Seq(
      (1L, 1L, 1000L, "free", 0.0), (1L, 2L, 2000L, "pro", 0.0),
      (2L, 3L, 3000L, "free", 0.0)))
    val profiles = Groups.buildProfiles(df, "user_id", Seq("plan"))
    val ids = Groups.hasPropertyValue(profiles,
      PropFilter("plan", PropOp.Eq, Seq("pro")), "user_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L)) // user 1's CURRENT plan is pro; had-free doesn't match
  }
}
