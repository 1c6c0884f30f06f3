package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo-data generator — the Spark build of the reference's
  * events-gen crate (reference events-gen/src/generator.rs: a
  * probabilistic "shop" scenario — users open sessions over a time
  * period and walk a view→cart→purchase funnel; cmd `store` seeds a
  * demo project with it).
  *
  * The reference draws from a seeded RNG one event at a time. The
  * Spark-first translation derives every draw from an md5-based
  * integer hash of (tag, user, session) instead: generation becomes a
  * pure projection over `spark.range` — embarrassingly parallel (the
  * range splits across executors, no state, no shuffle until the
  * caller aggregates), reproducible under retries/speculation (a
  * recomputed task re-derives identical rows, which a seeded
  * per-partition RNG does NOT under repartitioning), and portable:
  * md5 is standardized, so the exact corpus is recomputable in SQL
  * (the q_gen_events oracle builds the same events in DuckDB).
  */
object EventsGen {

  /** 60-bit uniform draw: the engine-portable md5 hash
    * ([[graft.pipeline.Dedup.md5Hash60]] — identical in DuckDB as
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`) over
    * "tag:user[:session]". */
  def draw(tag: String, parts: Column*): Column =
    graft.pipeline.Dedup.md5Hash60(concat_ws(":", (lit(tag) +: parts): _*))

  /** Epoch µs of 2024-01-01T00:00:00Z. */
  private val Base2024Us = 1704067200000000L

  /** Generate the shop-scenario event stream: one row per event with
    * (user_id, session, event_type, ts_us, product_id, vcents).
    * Every user opens 1..maxSessions sessions at hashed offsets
    * within periodDays; each session views a hashed product, clicks
    * with probability clickPct/100 (+1 min), and purchases with
    * probability buyPct/100 of clicks (+2 min, hashed price in
    * cents). */
  def generate(spark: SparkSession, nUsers: Long, maxSessions: Int = 3,
               nProducts: Int = 100, periodDays: Int = 30,
               clickPct: Int = 60, buyPct: Int = 30): DataFrame = {
    val users = spark.range(1, nUsers + 1).toDF("user_id")
    val sessions = users
      .withColumn("n_sessions", lit(1) + pmod(draw("s", col("user_id")), lit(maxSessions)))
      .select(col("user_id"),
        explode(sequence(lit(0L), col("n_sessions") - 1)).as("session"))
    val t0 = lit(Base2024Us) +
      pmod(draw("t", col("user_id"), col("session")), lit(periodDays * 86400L)) * lit(1000000L)
    val clicks = pmod(draw("c", col("user_id"), col("session")), lit(100L)) < clickPct
    val buys = clicks &&
      pmod(draw("b", col("user_id"), col("session")), lit(100L)) < buyPct
    val product = pmod(draw("p", col("user_id"), col("session")), lit(nProducts.toLong))
    val vcents = pmod(draw("v", col("user_id"), col("session")), lit(10000L))
    def ev(name: String, cond: Column, tsUs: Column, cents: Column): Column =
      when(cond, struct(lit(name).as("event_type"), tsUs.as("ts_us"), cents.as("vcents")))
    sessions
      .withColumn("product_id", product)
      .select(col("user_id"), col("session"), col("product_id"),
        explode(filter(array(
          ev("view", lit(true), t0, lit(null).cast("long")),
          ev("click", clicks, t0 + 60000000L, lit(null).cast("long")),
          ev("purchase", buys, t0 + 120000000L, vcents)),
          e => e.isNotNull)).as("e"))
      .select(col("user_id"), col("session"),
        col("e.event_type"), col("e.ts_us"), col("product_id"), col("e.vcents"))
  }
}
