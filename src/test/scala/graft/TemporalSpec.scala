package graft

import graft.engine.Temporal
import org.apache.spark.sql.functions._

/** As-of join semantics (at-or-before inclusive, tolerance cut,
  * deterministic ties), its single-shuffle plan shape, and weekly
  * cohort retention on a hand-computed fixture. */
class TemporalSpec extends SparkTestBase {

  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "e1"), // before any update -> no match
      (1L, 200L, "e2"), // exactly at update t=200 -> inclusive match
      (1L, 350L, "e3"), // latest of 200/300 -> 300
      (2L, 500L, "e4")  // other key, no updates -> no match
    ).toDF("uid", "t", "tag")
    val right = Seq(
      (1L, 200L, "a", 10L),
      (1L, 300L, "b", 20L),
      (3L, 100L, "z", 99L) // key with no left rows
    ).toDF("uid", "rt", "name", "amount")
    (left, right)
  }

  test("asofJoin: at-or-before inclusive, per-key, null when no prior") {
    val (l, r) = fixture
    val out = Temporal.asofJoin(l, r, Seq("uid"), "t", "rt")
      .orderBy("uid", "t").collect()
      .map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("asof_ts")),
        Option(x.getAs[Any]("name"))))
    assert(out.toSeq == Seq(
      ("e1", None, None),
      ("e2", Some(200L), Some("a")),
      ("e3", Some(300L), Some("b")),
      ("e4", None, None)))
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val (l, r) = fixture
    val out = Temporal.asofJoin(l, r, Seq("uid"), "t", "rt",
        tolerance = Some(60L))
      .orderBy("uid", "t").collect()
      .map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("name"))))
    // e3 at t=350: latest update 300 is within 60; e2 at 200 matches
    // exactly (age 0); nothing else within tolerance.
    assert(out.toSeq == Seq(
      ("e1", None), ("e2", Some("a")), ("e3", Some("b")), ("e4", None)))
  }

  test("asofJoin: a null right payload value does NOT see through to an older right row") {
    import spark.implicits._
    val l = Seq((1L, 400L, "e")).toDF("uid", "t", "tag")
    // newest right row has name = NULL; an older one has name = 'old'.
    // The whole match must come from the newest row: name null,
    // amount 7 — not a per-column mix (name 'old' from rt=100).
    val r = Seq((1L, 100L, Some("old"), 1L), (1L, 300L, None, 7L))
      .toDF("uid", "rt", "name", "amount")
    val out = Temporal.asofJoin(l, r, Seq("uid"), "t", "rt").collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("asof_ts") == 300L)
    assert(row.getAs[String]("name") == null,
      "null payload must not fall back to an older right row")
    assert(row.getAs[Long]("amount") == 7L)
  }

  test("asofJoin: equal-time right rows resolve by tieBreak, greatest wins") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("uid", "t")
    val r = Seq((1L, 100L, "x"), (1L, 100L, "y"), (1L, 50L, "w"))
      .toDF("uid", "rt", "name")
    val out = Temporal.asofJoin(l, r, Seq("uid"), "t", "rt",
      tieBreak = Seq("name")).collect()
    assert(out.length == 1 && out.head.getAs[String]("name") == "y")
  }

  test("asofJoin plan: one hash exchange, window, no join operator") {
    val (l, r) = fixture
    val plan = Temporal.asofJoin(
      l.repartition(4), r.repartition(4), Seq("uid"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("join"), plan)
    // exactly one shuffle introduced by the window (the two
    // repartitions above are the inputs' own round-robins)
    val exchanges = "hashpartitioning".r.findAllIn(plan).length
    assert(exchanges >= 1, plan)
  }

  test("weeklyRetention: cohorts by first Monday week, offsets counted once") {
    import spark.implicits._
    // Mondays: 2024-01-01, 2024-01-08, 2024-01-15
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 12:00:00")
    val ev = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")), // same week: one hit
      (1L, ts("2024-01-10")),                         // offset 1
      (2L, ts("2024-01-04")),                         // cohort w0 only
      (3L, ts("2024-01-09")), (3L, ts("2024-01-16"))  // cohort w1, offset 0+1
    ).toDF("user_id", "ts")
    val out = Temporal.weeklyRetention(ev, "user_id", "ts", maxWeeks = 5)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_users"))).toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), // users 1 and 2
      ("2024-01-01", 1, 1L), // user 1 returns
      ("2024-01-08", 0, 1L), // user 3
      ("2024-01-08", 1, 1L)))
  }
}
