package graft

import graft.engine.{JsonApi, Metadata}
import graft.model._
import org.apache.spark.sql.functions._

class MetadataSpec extends SparkTestBase {

  private def df = eventsDf(Seq(
    (1L, 1000L, "view", "ios", 5.0), (1L, 2000L, "buy", "ios", 50.0),
    (2L, 3000L, "view", "and", 2.0)))

  test("registry auto-derives from the schema with display names and flags") {
    val reg = Metadata.fromEvents(df,
      display = Map("value" -> "Revenue", "event_type" -> "Event Name"))
    val rev = reg.property("Revenue")
    assert(rev.column == "value" && rev.dataType == "double" && !rev.isDictionary)
    assert(reg.property("event name").column == "event_type") // case-insensitive
    assert(reg.property("Event Name").isDictionary)           // string → dict-codable
    assert(reg.property("user_id").isSystem)
    assert(reg.eventNames == Set("view", "buy"))
  }

  test("strict registry rejects unknown properties and events") {
    val reg = Metadata.fromEvents(df)
    val err = intercept[Json.JsonError](reg.property("no_such"))
    assert(err.getMessage.contains("known:"))
    assertThrows[Json.JsonError](reg.validateEvent("no_such_event"))
    assert(reg.validateEvent("view") == "view")
    // open registry passes anything through
    assert(Registry.open.column("whatever") == "whatever")
  }

  test("duplicate display names are rejected at construction, not silently shadowed") {
    // both columns mapped to "Revenue": a request addressing it would
    // silently resolve to whichever survived the map — reject instead
    val err = intercept[Json.JsonError](Metadata.fromEvents(df,
      display = Map("value" -> "Revenue", "device" -> "Revenue")))
    assert(err.getMessage.contains("duplicate display name"))
    assert(err.getMessage.contains("value") && err.getMessage.contains("device"))
    // case-insensitive collision too
    assertThrows[Json.JsonError](Metadata.fromEvents(df,
      display = Map("value" -> "Revenue", "device" -> "revenue")))
  }

  test("event-name collect is bounded; over the cap validation disables instead of misfiring") {
    val reg = Metadata.fromEvents(df, maxEventNames = 1)
    assert(reg.eventNames.isEmpty)           // cap exceeded → list dropped
    assert(reg.validateEvent("anything") == "anything") // validation off, not wrong
    val regOk = Metadata.fromEvents(df, maxEventNames = 10)
    assert(regOk.eventNames == Set("view", "buy"))
  }

  test("cyclic or over-deep custom events are rejected at registry entry") {
    import graft.model.{CustomEvent, CustomEventMember, Registry}
    // members embed definitions by VALUE (immutable Seq), so a true
    // pointer cycle is unconstructible — the reference's cycle check
    // (ids revisited during the walk, custom_events.rs:97-101)
    // degenerates here to rejecting any re-reference of the same
    // definition instance, which is what a by-id CRUD layer resolving
    // into shared objects would produce
    val shared = CustomEvent("leaf", Seq(CustomEventMember.Event(Some("view"))))
    val diamond = CustomEvent("diamond", Seq(
      CustomEventMember.Custom(shared), CustomEventMember.Custom(shared)))
    assertThrows[graft.model.Json.JsonError](
      Registry.open.withCustomEvent(1L, diamond))
    // nesting beyond MAX_EVENTS_LEVEL=3 (reference custom_events.rs:42)
    val deep = (1 to 4).foldLeft(
      CustomEvent("leaf", Seq(CustomEventMember.Event(Some("view"))))) {
      (inner, i) => CustomEvent(s"level$i", Seq(CustomEventMember.Custom(inner)))
    }
    assertThrows[graft.model.Json.JsonError](
      Registry.open.withCustomEvent(2L, deep))
    // a legal two-level nest still registers (and Registry.apply
    // validates the construction-time map the same way)
    val ok = CustomEvent("outer", Seq(CustomEventMember.Custom(
      CustomEvent("leaf", Seq(CustomEventMember.Event(Some("view")))))))
    assert(Registry.open.withCustomEvent(3L, ok).customEvent(3L).name == "outer")
    assertThrows[graft.model.Json.JsonError](
      Registry(Seq.empty, customEvents = Map(1L -> diamond), strict = false))
  }

  test("event-property associations follow case-insensitive rename and delete") {
    import graft.model.{PropertyMeta, Registry}
    val r = Registry(Seq(PropertyMeta("Revenue", "value", "double")), strict = false)
      .withEventName("install").withEventProperty("install", "Revenue")
    // addressing by a different case must remap the association, not
    // orphan it (props map is case-insensitive; associations must be too)
    val renamed = r.renameProperty("revenue", "Turnover")
    assert(renamed.eventProperties("install") == Set("Turnover"))
    assert(r.withoutProperty("REVENUE").eventProperties("install").isEmpty)
  }

  test("per-group namespaces resolve homonyms independently with shared fallback") {
    // reference PropertiesLayer{groups: Vec<Properties>} (platform/src/
    // http/mod.rs:40-43): "Tier" names DIFFERENT columns in group 0
    // (users → value) and group 1 (orgs → device)
    val reg = Metadata.fromEvents(df)
      .withGroupColumns(Seq("user_id", "device"))
      .withGroupProperty(0, PropertyMeta("Tier", "value", "double"))
      .withGroupProperty(1, PropertyMeta("Tier", "device", "string"))
    assert(reg.groupProperty(0, "Tier").column == "value")
    assert(reg.groupProperty(1, "tier").column == "device") // case-insensitive
    // a name absent from the group namespace falls back to the shared
    // event namespace; a name absent from both still errors (strict)
    assert(reg.groupProperty(1, "event_type").column == "event_type")
    assertThrows[Json.JsonError](reg.groupProperty(0, "no_such"))
    assertThrows[Json.JsonError](reg.groupProperty(7, "Tier")) // unknown group
    // group-scoped rename/delete never leaks across namespaces
    val renamed = reg.renameGroupProperty(1, "Tier", "Plan")
    assert(renamed.groupProperty(1, "Plan").column == "device")
    assert(renamed.groupProperty(0, "Tier").column == "value")
    assertThrows[Json.JsonError](reg.withoutGroupProperty(0, "nope"))
    assert(reg.withoutGroupProperty(1, "Tier").groupProperties(1).isEmpty)
    // namespace survives unrelated copy-on-write mutations
    assert(reg.withEventName("x").groupProperty(1, "Tier").column == "device")

    // end to end through the JSON DSL: group-0 "Tier" filters value,
    // group-1 "Tier" breaks down by device — one query, two homonyms
    val json = """{
      "time": {"type": "from", "from": "1970-01-01T00:00:00Z"},
      "intervalUnit": "day",
      "events": [{"eventType": "all",
        "filters": [{"type": "property", "propertyType": "group", "group": 0,
                     "propertyName": "Tier", "operation": "gte", "value": [5]}],
        "queries": [{"type": "countEvents", "name": "cnt"}]}],
      "breakdowns": [{"type": "property", "propertyType": "group", "group": 1,
                      "propertyName": "Tier"}]
    }"""
    val out = JsonApi.eventSegmentation(df, json, registry = reg)
    assert(collectMap(out, "device", "cnt") == Map("ios" -> 2L))
  }

  test("customEventJson maps stored columns back to display names and namespaces") {
    // a stored PropFilter carries only the physical column; rendering
    // must recover: (a) the CURRENT event-namespace display name,
    // (b) a group-typed ref when only a group namespace addresses the
    // column, (c) the raw column as open-registry passthrough
    val reg = Metadata.fromEvents(df, display = Map("value" -> "Revenue"))
      .withGroupColumns(Seq("user_id", "device"))
      // group-1-only property over a column with no event display name
      .withoutProperty("device")
      .withGroupProperty(1, PropertyMeta("Kind", "device", "string"))
    implicit val r: Registry = reg

    val ce = CustomEvent("mixed", Seq(
      CustomEventMember.Event(Some("view"), Seq(
        PropFilter("value", PropOp.Gt, Seq(10L)),       // event ns: Revenue
        PropFilter("device", PropOp.Eq, Seq("ios"))))))  // group 1 ns: Kind
    val rendered = JsonDsl.customEventJson(ce)
    assert(rendered.contains("\"propertyType\":\"event\",\"propertyName\":\"Revenue\""))
    assert(rendered.contains("\"propertyType\":\"group\",\"group\":1,\"propertyName\":\"Kind\""))

    // and the render re-parses to the SAME stored definition — the
    // group ref resolves through its namespace back to 'device'
    val reparsed = JsonDsl.customEventDef(Json.parse(rendered))
    assert(reparsed == ce)

    // a column no namespace addresses renders raw — re-parseable only
    // through an OPEN registry's passthrough (a strict one rightly
    // rejects it, matching its decode-time behavior everywhere else)
    val ghost = CustomEvent("ghost", Seq(
      CustomEventMember.Event(Some("view"), Seq(
        PropFilter("ghost_col", PropOp.Exists)))))
    val gRendered = JsonDsl.customEventJson(ghost)
    assert(gRendered.contains("\"propertyType\":\"event\",\"propertyName\":\"ghost_col\""))
    assert(JsonDsl.customEventDef(Json.parse(gRendered))(Registry.open) == ghost)
    assertThrows[Json.JsonError](JsonDsl.customEventDef(Json.parse(gRendered)))
  }

  test("JSON requests resolve display names through the registry") {
    val reg = Metadata.fromEvents(df, display = Map("value" -> "Revenue"))
    val json = """{
      "time": {"type": "from", "from": "1970-01-01T00:00:00Z"},
      "intervalUnit": "day",
      "events": [{"eventType": "regular", "eventName": "buy",
        "filters": [{"type": "property", "propertyType": "event",
                     "propertyName": "Revenue", "operation": "gte", "value": [10]}],
        "queries": [{"type": "countEvents", "name": "cnt"}]}]
    }"""
    val out = JsonApi.eventSegmentation(df, json, registry = reg)
      .select("cnt").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
    // unknown event name in a strict registry fails at decode time
    val bad = json.replace("\"buy\"", "\"nope\"")
    assertThrows[Json.JsonError](JsonDsl.eventSegmentation(bad, registry = reg))
  }
}
