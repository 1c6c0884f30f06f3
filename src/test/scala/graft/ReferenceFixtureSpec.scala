package graft

import graft.engine._
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end run over the reference's CANONICAL integration fixture —
  * the 24 events of query/resources/test/events.csv (provider schema
  * query/src/lib.rs:673-720; see FIXTURES.md §1): dict-coded event ids
  * (1 = "View Product", 2 = "Buy Product"), five group dimensions
  * (group_0 = users), denormalized group properties, decimal revenue.
  * The rows below are that test DATA transcribed verbatim; every
  * expected value here was computed independently (DuckDB over the
  * CSV), not read from reference code.
  */
class ReferenceFixtureSpec extends SparkTestBase {

  // (group_0, created_at, event(dict key), user_device, user_is_premium,
  //  event_product_name, event_revenue)
  private val fixtureRows: Seq[(Long, String, Long, String, Boolean, String, Double)] = Seq(
    (1L, "2022-08-29 00:00:00", 1L, "iphone", true, "google pixel", 533),
    (1L, "2022-08-29 00:01:01", 2L, "iphone", true, "google pixel", 533),
    (1L, "2022-08-29 00:02:02", 1L, "iphone", true, "samsung s9", 31),
    (1L, "2022-08-29 00:03:03", 1L, "iphone", false, "samsung s10", 12),
    (1L, "2022-08-29 00:04:04", 1L, "iphone", false, "samsung s11", 131),
    (1L, "2022-08-29 00:05:05", 1L, "iphone", false, "samsung s12", 11.3),
    (1L, "2022-08-29 00:06:06", 2L, "iphone", false, "samsung s10", 11.3),
    (1L, "2022-08-29 00:07:07", 1L, "iphone", false, "samsung s13", 44),
    (1L, "2022-08-29 00:08:08", 1L, "iphone", false, "samsung s14", 576),
    (1L, "2022-08-29 00:09:09", 1L, "iphone", false, "samsung s15", 576),
    (1L, "2022-08-29 00:10:10", 2L, "iphone", false, "samsung s13", 576),
    (1L, "2022-08-29 00:11:11", 2L, "iphone", false, "samsung s14", 576),
    (2L, "2022-08-29 00:12:12", 1L, "android", false, "google pixel", 33.23),
    (2L, "2022-08-29 00:13:13", 1L, "android", false, "google pixel 2", 533.5),
    (2L, "2022-08-29 00:14:14", 1L, "android", false, "google pixel 2", 533.5),
    (2L, "2022-08-29 00:15:15", 1L, "android", false, "google pixel 2", 533.5),
    (2L, "2022-08-29 00:16:16", 2L, "android", false, "google pixel 2", 533.5),
    (2L, "2022-08-29 00:17:17", 1L, "android", false, "iphone 13", 999.9),
    (3L, "2022-08-29 00:18:18", 1L, "android", true, "samsung s9", 31),
    (3L, "2022-08-29 00:19:19", 2L, "android", false, "iphone 13", 999.9),
    (3L, "2022-08-29 00:20:20", 1L, "android", false, "iphone case", 12),
    (3L, "2022-08-29 00:21:21", 1L, "android", false, "iphone case", 13),
    (3L, "2022-08-29 00:22:22", 1L, "android", false, "iphone case", 14),
    (3L, "2022-08-29 00:23:23", 1L, "android", false, "iphone case", 15))

  /** The fixture in the reference's STORAGE form: dict keys in the
    * event column, the event-name dictionary alongside (the reference
    * decodes at plan exit via DictionaryDecode). */
  private def fixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    val raw = fixtureRows.toDF(
      "group_0", "created_at", "event_key", "user_device",
      "user_is_premium", "event_product_name", "event_revenue")
      .withColumn("ts", to_timestamp(col("created_at")))
      .withColumn("event_id", monotonically_increasing_id())
      .drop("created_at")
    val dict = Seq(("View Product", 1L), ("Buy Product", 2L)).toDF("value", "key")
    (raw, dict)
  }

  /** Engine view: decode the event dictionary and map the reference's
    * column names onto the engine's (group_0 = the user dimension). */
  private def engineView: DataFrame = {
    val (raw, dict) = fixture
    Dictionary.decode(raw, dict, "event_key", "event_type")
      .withColumnRenamed("group_0", "user_id")
  }

  private val fullRange = QueryTime.Between(
    java.sql.Timestamp.valueOf("2022-08-29 00:00:00"),
    java.sql.Timestamp.valueOf("2022-08-30 00:00:00"))

  test("event segmentation over the canonical fixture: counts, users, revenue") {
    val req = EventSegmentationRequest(
      time = fullRange, interval = TimeIntervalUnit.Day,
      events = Seq(EventBlock(None, queries = Seq(
        NamedQuery(Query.CountEvents, "cnt"),
        NamedQuery(Query.CountUniqueGroups(), "users"),
        NamedQuery(Query.AggregateProperty("rev100", AggFn.Sum), "rev100")))),
      breakdowns = Seq("event_type"))
    val out = EventSegmentation.run(
      engineView.withColumn("rev100", round(col("event_revenue") * 100).cast("long")), req)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("users"), r.getAs[Long]("rev100")))).toMap
    // independently computed over the CSV: 18 views / 6 buys, 3 users
    // each, revenue 4632.93 / 3229.70
    assert(out("View Product") == ((18L, 3L, 463293L)))
    assert(out("Buy Product") == ((6L, 3L, 322970L)))
  }

  test("funnel View Product -> Buy Product converts all three fixture users") {
    val out = Funnel.run(spark, engineView, Funnel.Request(
      steps = Seq(col("event_type") === "View Product",
        col("event_type") === "Buy Product"),
      windowMs = 24 * 3600 * 1000L,
      count = Funnel.Unique)).collect()
      .map(r => r.getAs[Int]("step") -> r.getAs[Long]("total")).toMap
    assert(out == Map(1 -> 3L, 2 -> 3L))
  }

  test("JSON request with the reference's five group dimensions and display names") {
    val registry = Registry(Seq(
      PropertyMeta("Device", "user_device", "string", isDictionary = true),
      PropertyMeta("Is Premium", "user_is_premium", "boolean"),
      PropertyMeta("Product Name", "event_product_name", "string"),
      PropertyMeta("Revenue", "event_revenue", "double")),
      eventNames = Set("View Product", "Buy Product"))
      .withGroupColumns(Seq("user_id", "group_1", "group_2", "group_3", "group_4"))
    val json = """{
      "time": {"type": "between", "from": "2022-08-29T00:00:00Z", "to": "2022-08-30T00:00:00Z"},
      "group": 0,
      "intervalUnit": "day",
      "events": [{"eventType": "regular", "eventName": "View Product",
        "queries": [{"type": "countUniqueGroups", "name": "users"}]}],
      "breakdowns": [{"type": "property", "propertyType": "group", "propertyName": "Device"}]
    }"""
    val out = JsonApi.eventSegmentation(engineView, json, registry = registry)
      .collect().map(r => r.getAs[String]("user_device") -> r.getAs[Long]("users")).toMap
    assert(out == Map("iphone" -> 1L, "android" -> 2L))
    // unknown event names are rejected by the strict registry
    assertThrows[Json.JsonError](JsonDsl.eventSegmentation(
      json.replace("View Product", "No Such Event"), registry = registry))
  }
}
