package graft

import graft.engine.Funnel
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based funnel invariants (SURVEY.md §5): for ANY event
  * stream — random users, event types, timestamps — the aggregated
  * output must satisfy:
  *   totals monotone non-increasing across steps,
  *   dropped_off(i) = total(i-1) - total(i),
  *   conversion ratios within [0, 100],
  *   Unique-mode completed total ≤ number of distinct users.
  * (Raw ScalaCheck Gen sampling with a fixed seed — the scalatestplus
  * bridge isn't available offline.)
  */
class FunnelPropertySpec extends SparkTestBase {

  private val eventGen = for {
    user <- Gen.choose(1L, 4L)
    ts <- Gen.choose(0L, 100000L)
    ev <- Gen.oneOf("A", "B", "C", "D")
  } yield (user, ts, ev, "dev", 1.0)

  private val streamGen = Gen.listOfN(40, eventGen)

  test("funnel invariants hold on random event streams") {
    val seed0 = rng.Seed(42L)
    var seed = seed0
    (1 to 8).foreach { i =>
      val rows = streamGen.apply(Gen.Parameters.default, seed)
        .getOrElse(sys.error("gen failed"))
      seed = seed.next
      val out = Funnel.run(spark, eventsDf(rows), Funnel.Request(
        steps = Seq(col("event_type") === "A", col("event_type") === "B",
          col("event_type") === "C"),
        windowMs = 30000, count = Funnel.Unique)).collect()
      if (out.nonEmpty) {
        val byStep = out.map(r => r.getAs[Int]("step") ->
          (r.getAs[Long]("total"), r.getAs[Long]("dropped_off"),
            r.getAs[Double]("conversion_ratio"))).toMap
        assert(byStep.keySet == Set(1, 2, 3), s"case $i: steps ${byStep.keySet}")
        val totals = (1 to 3).map(byStep(_)._1)
        assert(totals(0) >= totals(1) && totals(1) >= totals(2),
          s"case $i: totals not monotone: $totals")
        assert(byStep(2)._2 == totals(0) - totals(1), s"case $i dropped_off(2)")
        assert(byStep(3)._2 == totals(1) - totals(2), s"case $i dropped_off(3)")
        (1 to 3).foreach { s =>
          val cr = byStep(s)._3
          assert(cr >= 0.0 && cr <= 100.0, s"case $i: ratio out of range: $cr")
        }
        // Unique mode: partial attempts may restart after window
        // overflow, so step-1 total can exceed the user count; the
        // COMPLETED total is at most one per user.
        val users = rows.map(_._1).distinct.size
        assert(totals(2) <= users, s"case $i: completed ${totals(2)} > users $users")
      }
    }
  }
}
