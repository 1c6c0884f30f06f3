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

  test("shop transition table covers [0,1000) per live (intent, state)") {
    import graft.gen.ShopGen
    ShopGen.integerTable.groupBy(t => (t.intent, t.state)).foreach {
      case ((intent, state), rows) =>
        val sorted = rows.sortBy(_.lo)
        assert(sorted.head.lo == 0 && sorted.last.hi == 1000,
          s"$intent/$state must span the draw space")
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a.hi == b.lo, s"$intent/$state has a gap")
          case _ =>
        }
        rows.foreach(r => assert(r.lo < r.hi))
    }
    // every non-terminal next state either has outgoing rows for the
    // intent or is a modal (Register/Login return to the page)
    val live = ShopGen.integerTable.groupBy(t => (t.intent, t.state)).keySet
    val terminalish = Set("Bounce", "EndSession", "AbandonCart", "Register", "Login")
    ShopGen.integerTable.filterNot(t => terminalish.contains(t.next)).foreach { t =>
      // zero-total states under an intent are legal terminals, but the
      // BUY intent must keep the full checkout chain alive
      if (t.intent == "buy")
        assert(live.contains((t.intent, t.next)), s"buy walk dead-ends at ${t.next}")
    }
  }

  test("shop corpus is deterministic and funnel-shaped with real orders") {
    import graft.gen.ShopGen
    val a = ShopGen.generate(spark, 150).orderBy("user_id", "session", "step")
      .collect().toSeq
    val b = ShopGen.generate(spark, 150).repartition(7)
      .orderBy("user_id", "session", "step").collect().toSeq
    assert(a == b, "pure hashed walk: partitioning cannot change the corpus")

    val byType = a.groupBy(_.getString(3)).map { case (k, v) => k -> v.size }
    // the reference's funnel: views dominate carts dominate checkout
    // stages dominate completed orders, and every stage is present
    val chain = Seq("Product Viewed", "Product Added To Cart", "Cart Viewed",
      "Customer Information Entered", "Shipping Method Entered",
      "Payment Method Entered", "Order Verified", "Order Completed")
    chain.foreach(e => assert(byType.getOrElse(e, 0) > 0, s"missing $e"))
    chain.sliding(2).foreach { case Seq(hi, lo) =>
      assert(byType(hi) >= byType(lo), s"$hi should outnumber $lo")
    }
    // orders drain the cart: every Order Completed carries revenue
    // equal to some sum of catalog prices (> 0)
    val orders = a.filter(_.getString(3) == "Order Completed")
    assert(orders.nonEmpty && orders.forall(_.getLong(6) > 0))
    // register/login dedup: at most one of each per session
    val regs = a.filter(r => r.getString(3) == "User Registered")
      .groupBy(r => (r.getLong(0), r.getLong(1))).values
    assert(regs.forall(_.size == 1))
    // refund sessions exist and track the reference's orders page
    assert(byType.getOrElse("Product Refunded", 0) > 0)
    assert(byType.getOrElse("Orders Viewed", 0) >= byType("Product Refunded"))
  }
}
