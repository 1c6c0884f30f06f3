package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shop-scenario demo-data generator — the Spark build of the
  * reference events-gen crate's probabilistic store walk (reference
  * events-gen/src/store/scenario.rs:1-793 run loop,
  * store/transitions.rs:5-104 Markov table,
  * store/coefficients.rs:25-130 per-intention coefficients,
  * store/intention.rs:16-53 intent selection,
  * store/actions.rs:34-56 action→event mapping,
  * store/products.rs product catalog). [[EventsGen]] remains the
  * minimal hash-projection corpus; this generator carries the
  * reference's SCENARIO SHAPE: sessions pick an intention
  * (browse / buy / refund), then walk the reference's transition
  * graph (ViewIndex → promotions/search/deals → product → cart →
  * checkout chain → order, with register/login interleaves, bounces
  * and cart abandonment), emitting the reference's event names.
  *
  * Determinism: the reference draws from an unseeded ThreadRng — its
  * corpus is irreproducible by design. Here every draw derives from
  * the md5-60 integer hash of a tagged key ("w:user:session:step"),
  * so generation is a pure function: embarrassingly parallel (the
  * session frame splits across executors, the walk is a narrow
  * per-row loop, no shuffle until the caller aggregates), stable
  * under retries/speculation, and portable — a SQL engine recomputes
  * the identical corpus from the same literals (the
  * q_gen_events_shop oracle walks the same table with a recursive
  * CTE).
  *
  * The per-intention edge weights are normalized ONCE, on the
  * driver, into integer per-mille cumulative ranges
  * ([[integerTable]]); both the Spark walk and the SQL oracle consume
  * those integers, so no floating-point normalization happens at
  * query time in either engine.
  *
  * Documented simplifications vs the reference (shape-preserving,
  * necessary for a stateless-per-session, cross-engine-checkable
  * walk): refund intent is drawn for any non-first session rather
  * than gated on purchase history; hourly traffic weights are
  * uniform; Register/Login emit their event and return to the
  * previous page state instead of the table's terminal self-loop;
  * product choice is uniform over the catalog (no spline weights). */
object ShopGen {

  /** Coefficient set per intention (reference coefficients.rs:25-130,
    * no ad-source multiplier). */
  private final case class Coef(
      abandonCart: Double, cartCompletion: Double, discover: Double,
      searchForProduct: Double, goToIndex: Double, bounceRate: Double,
      buyMultipleProducts: Double, searchQuality: Double,
      viewProductToBuy: Double, viewCart: Double, refund: Double,
      register: Double, login: Double)

  private val BrowseCoef = Coef(0.1, 0.9, 0.7, 0.0, 0.1, 0.1, 0.1, 0.9, 0.1, 0.5, 0.0, 0.2, 0.2)
  private val BuyCoef    = Coef(0.01, 0.9, 0.7, 0.0, 0.1, 0.1, 0.1, 0.9, 0.5, 0.5, 0.0, 0.8, 0.8)
  private val RefundCoef = Coef(0.0, 0.0, 0.0, 0.0, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0)

  val Intents: Seq[String] = Seq("browse", "buy", "refund")

  /** The reference transition table (transitions.rs:5-104): state →
    * (next action, weight, wait seconds). */
  private def edges(c: Coef): Seq[(String, Seq[(String, Double, Int)])] = Seq(
    "ViewIndex" -> Seq(
      ("ViewIndexPromotions", c.discover, 3),
      ("SearchProduct", c.discover * 0.8, 15),
      ("SearchProduct", c.searchForProduct, 6),
      ("ViewDeals", c.discover * 0.7, 8),
      ("Bounce", c.bounceRate, 5),
      ("ViewOrders", c.refund, 7),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20)),
    "ViewIndexPromotions" -> Seq(
      ("ViewProduct", c.discover, 10),
      ("ViewIndex", c.goToIndex, 0),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20)),
    "ViewDeals" -> Seq(
      ("ViewProduct", c.discover, 10),
      ("ViewIndex", c.goToIndex, 5),
      ("Bounce", c.bounceRate, 5),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20)),
    "ViewOrders" -> Seq(
      ("RefundProduct", c.refund, 10),
      ("Register", c.register, 60),
      ("Login", c.login, 20)),
    "RefundProduct" -> Seq(
      ("EndSession", 1.0, 0),
      ("Register", c.register, 60),
      ("Login", c.login, 20)),
    "SearchProduct" -> Seq(
      ("ViewProduct", c.discover, 15),
      ("NotFound", c.searchQuality * 0.2, 4),
      ("ViewIndex", c.goToIndex, 5),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20),
      ("Bounce", c.bounceRate, 5)),
    "NotFound" -> Seq(
      ("SearchProduct", c.discover, 0),
      ("ViewIndex", c.goToIndex, 0),
      ("Bounce", c.bounceRate * 1.1, 0)),
    "ViewProduct" -> Seq(
      ("ViewIndex", c.goToIndex, 5),
      ("ViewRelatedProduct", c.discover * 0.5, 20),
      ("AddProductToCart", c.viewProductToBuy, 30),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20),
      ("Bounce", c.bounceRate, 5)),
    "ViewRelatedProduct" -> Seq(
      ("ViewIndex", c.goToIndex, 5),
      ("ViewRelatedProduct", c.discover * 0.2, 20),
      ("AddProductToCart", c.viewProductToBuy * 0.9, 30),
      ("Register", c.register * 0.2, 60),
      ("Login", c.login * 0.2, 20),
      ("Bounce", c.bounceRate, 5)),
    "AddProductToCart" -> Seq(
      ("SearchProduct", c.buyMultipleProducts, 6),
      ("ViewIndex", c.buyMultipleProducts, 5),
      ("ViewRelatedProduct", c.discover, 10),
      ("ViewCart", c.viewCart, 5),
      ("AbandonCart", c.abandonCart, 5),
      ("Register", c.register * 0.7, 60),
      ("Login", c.login * 0.7, 20)),
    "ViewCart" -> Seq(
      ("EnterCustomerInformation", c.viewCart, 5),
      ("AbandonCart", c.abandonCart * 0.9, 5),
      ("Register", c.register * 10.0, 60),
      ("Login", c.login * 10.0, 20)),
    "EnterCustomerInformation" -> Seq(
      ("EnterShippingMethod", c.cartCompletion, 20),
      ("AbandonCart", c.abandonCart * 0.8, 5)),
    "EnterShippingMethod" -> Seq(
      ("EnterPaymentMethod", c.cartCompletion, 15),
      ("AbandonCart", c.abandonCart * 0.7, 5)),
    "EnterPaymentMethod" -> Seq(
      ("VerifyOrder", c.cartCompletion, 20),
      ("AbandonCart", c.abandonCart * 0.6, 5)),
    "VerifyOrder" -> Seq(
      ("CompleteOrder", c.cartCompletion, 10),
      ("AbandonCart", c.abandonCart * 0.5, 5)),
    "CompleteOrder" -> Seq(
      ("EndSession", 1.0, 10)))

  /** One integer transition row: draw in [lo, hi) (per-mille) moves
    * `state` to `next` after `waitSec`. */
  final case class Trans(intent: String, state: String, lo: Int, hi: Int,
                         next: String, waitSec: Int)

  /** The normalized integer table: per (intent, state), edge weights
    * become cumulative per-mille ranges covering exactly [0, 1000);
    * zero-weight edges get empty ranges and vanish; zero-TOTAL states
    * (unreachable under that intent) emit no rows and act terminal.
    * Both engines consume these integers verbatim. */
  val integerTable: Seq[Trans] = {
    val coefOf = Map("browse" -> BrowseCoef, "buy" -> BuyCoef, "refund" -> RefundCoef)
    for {
      intent <- Intents
      (state, es) <- edges(coefOf(intent))
      total = es.map(_._2).sum
      if total > 0.0
      row <- {
        var acc = 0.0
        var lo = 0
        es.flatMap { case (next, w, wait) =>
          acc += w
          val hi = math.round(1000.0 * acc / total).toInt
          val r = if (hi > lo) Some(Trans(intent, state, lo, hi, next, wait)) else None
          lo = hi
          r
        }
      }
    } yield row
  }

  /** Action → tracked event name (reference actions.rs:34-56
    * `to_event`; Bounce/EndSession/AbandonCart/ViewIndexPromotions
    * track nothing). */
  val EventOf: Map[String, String] = Map(
    "ViewIndex" -> "Index Page Viewed",
    "ViewDeals" -> "Deals Viewed",
    "SearchProduct" -> "Product Searched",
    "NotFound" -> "Not Found",
    "ViewProduct" -> "Product Viewed",
    "ViewRelatedProduct" -> "Product Viewed",
    "AddProductToCart" -> "Product Added To Cart",
    "ViewCart" -> "Cart Viewed",
    "EnterCustomerInformation" -> "Customer Information Entered",
    "EnterShippingMethod" -> "Shipping Method Entered",
    "EnterPaymentMethod" -> "Payment Method Entered",
    "VerifyOrder" -> "Order Verified",
    "CompleteOrder" -> "Order Completed",
    "RefundProduct" -> "Product Refunded",
    "ViewOrders" -> "Orders Viewed",
    "Register" -> "User Registered",
    "Login" -> "User Logged In")

  private val Terminal = Set("Bounce", "EndSession", "AbandonCart")
  private val Modal = Set("Register", "Login") // emit + stay on the page

  /** Fixed demo catalog (the reference ships products.csv with name /
    * category / price; names here are original). Price in cents. */
  val Catalog: Seq[(Long, String, String, Long)] = Seq(
    (0L, "Trail Running Shoes", "sport", 8999L),
    (1L, "Carbon Road Bike", "sport", 129900L),
    (2L, "Espresso Machine", "kitchen", 24999L),
    (3L, "Cast Iron Skillet", "kitchen", 3499L),
    (4L, "Noise-Cancelling Headphones", "electronics", 19999L),
    (5L, "Mechanical Keyboard", "electronics", 10999L),
    (6L, "4K Action Camera", "electronics", 32999L),
    (7L, "Wool Blanket", "home", 5999L),
    (8L, "Ceramic Vase Set", "home", 4299L),
    (9L, "Leather Backpack", "accessories", 14999L),
    (10L, "Polarized Sunglasses", "accessories", 7499L),
    (11L, "Insulated Water Bottle", "accessories", 2499L))

  /** Epoch µs of 2024-01-01T00:00:00Z (shared with [[EventsGen]]). */
  private val Base2024Us = 1704067200000000L

  /** md5-60 of `s` (top 60 bits of the digest — identical to DuckDB's
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`). */
  private def md5_60(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Generate the shop corpus: one row per tracked event —
    * (user_id, session, step, event_type, ts_us, product_id,
    * revenue_cents). product_id = the session's current product (-1
    * before any product view); revenue_cents = the cart total an
    * Order Completed drains (0 elsewhere). Narrow typed walk over the
    * session frame — no shuffle, splits across executors with
    * spark.range. */
  def generate(spark: SparkSession, nUsers: Long, maxSessions: Int = 3,
               periodDays: Int = 30, maxSteps: Int = 25): DataFrame = {
    import spark.implicits._
    val table = integerTable.groupBy(t => (t.intent, t.state))
      .map { case (k, ts) => k -> ts.sortBy(_.lo).toArray }
    val eventOf = EventOf
    val prices = Catalog.map { case (id, _, _, p) => id -> p }.toMap
    val nProducts = Catalog.size.toLong
    val periodSec = periodDays * 86400L
    spark.range(1, nUsers + 1).toDF("user_id").as[Long]
      .mapPartitions { users =>
        val md = java.security.MessageDigest.getInstance("MD5")
        users.flatMap { u =>
          val nSessions = 1L + md5_60(md, s"s:$u") % maxSessions
          (0L until nSessions).iterator.flatMap { sess =>
            val intent =
              if (sess == 0L) { if (md5_60(md, s"i:$u:$sess") % 1000L < 800L) "browse" else "buy" }
              else {
                val d = md5_60(md, s"i:$u:$sess") % 1000L
                if (d < 100L) "refund" else if (d < 150L) "browse" else "buy"
              }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, String, Long, Long, Long)]
            var state = "ViewIndex"
            var ts = Base2024Us + (md5_60(md, s"t:$u:$sess") % periodSec) * 1000000L
            var product = -1L
            var cart = 0L
            // reference State.is_registered / is_logged_in
            // (scenario.rs:57-58): register/login track once per
            // session even though the modal edges stay selectable
            var registered = false
            var logged = false
            // step 0 = the session's landing page view
            out += ((u, sess, 0L, eventOf("ViewIndex"), ts, product, 0L))
            var step = 1L
            var done = false
            while (!done && step <= maxSteps) {
              table.get((intent, state)) match {
                case None => done = true // zero-weight state: terminal
                case Some(rows) =>
                  val d = (md5_60(md, s"w:$u:$sess:$step") % 1000L).toInt
                  val t = rows.find(r => d >= r.lo && d < r.hi).get
                  ts += t.waitSec * 1000000L
                  val next = t.next
                  if (next == "ViewProduct" || next == "ViewRelatedProduct")
                    product = md5_60(md, s"p:$u:$sess:$step") % nProducts
                  var revenue = 0L
                  if (next == "AddProductToCart")
                    cart += prices.getOrElse(product, 0L)
                  if (next == "CompleteOrder") { revenue = cart; cart = 0L }
                  val fresh = next match {
                    case "Register" => !registered
                    case "Login"    => !logged
                    case _          => true
                  }
                  if (next == "Register") registered = true
                  if (next == "Login") logged = true
                  if (fresh) eventOf.get(next).foreach { ev =>
                    out += ((u, sess, step, ev, ts, product, revenue))
                  }
                  if (Terminal.contains(next)) done = true
                  else if (!Modal.contains(next)) state = next
              }
              step += 1
            }
            out.iterator
          }
        }
      }
      .toDF("user_id", "session", "step", "event_type", "ts_us",
        "product_id", "revenue_cents")
  }
}
