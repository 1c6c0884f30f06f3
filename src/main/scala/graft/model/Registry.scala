package graft.model

/** Property/event metadata registry — the query-facing half of the
  * reference's metadata crate: logical (display) property name →
  * physical column + type + dictionary flag (reference
  * metadata/src/properties.rs:585-631 `get_or_create_*`), known event
  * names for request validation (events.rs), and custom events by id
  * (custom_events.rs:294-315). The reference auto-creates metadata on
  * ingest; here [[graft.engine.Metadata.fromEvents]] plays that role
  * by deriving the registry from the table schema.
  */
final case class PropertyMeta(
    name: String,            // logical / display name
    column: String,          // physical column
    dataType: String,
    /** String values worth dictionary-coding (graft.engine.Dictionary). */
    isDictionary: Boolean = false,
    isSystem: Boolean = false)

final class Registry(
    props: Map[String, PropertyMeta],
    val customEvents: Map[Long, CustomEvent],
    val eventNames: Set[String],
    strict: Boolean,
    /** Group-dimension index → physical column. The reference keeps a
      * fixed five (`group_0..group_4`, group 0 = users —
      * common/src/lib.rs:16-21 `GROUPS_COUNT`/`group_col`); here the
      * deployment configures which columns play those roles. */
    val groupCols: Seq[String] = Seq("user_id"),
    /** Event name → display names of the properties recorded on it —
      * the reference's event↔property association (events.rs
      * attach_property/detach_property; the UI reads it to suggest
      * filterable properties per event). Advisory metadata: the
      * engine never restricts a filter to attached properties, same
      * as the reference's query path. */
    val eventProperties: Map[String, Set[String]] = Map.empty,
    /** Per-group-dimension property NAMESPACES (reference
      * platform/src/http/mod.rs:40-43 `PropertiesLayer { events,
      * groups: Vec<Arc<Properties>> }`): groupProps(i) is group i's
      * own display-name → meta map, so "Plan" can name BOTH a user
      * property and an org property and resolve independently
      * (PropertyRef::Group carries the group index,
      * common/src/query.rs:200-204). A name absent from a group's
      * namespace falls back to the shared event namespace —
      * Metadata.fromEvents derives ONE schema for every column, and
      * group refs addressed that way predate the split. */
    val groupProps: Seq[Map[String, PropertyMeta]] = Seq.empty) {

  /** Logical name → metadata. Open registries pass unknown names
    * through unchanged (physical addressing keeps working); strict
    * registries reject them like the reference's validate_request. */
  def property(name: String): PropertyMeta =
    props.get(name.toLowerCase) match {
      case Some(m) => m
      case None if !strict => PropertyMeta(name, name, "unknown")
      case None =>
        val known = props.values.map(_.name).toSeq.sorted.mkString(", ")
        throw Json.JsonError(s"unknown property '$name' (known: $known)")
    }

  def column(name: String): String = property(name).column

  def validateEvent(name: String): String =
    if (!strict || eventNames.isEmpty || eventNames.contains(name)) name
    else throw Json.JsonError(s"unknown event '$name'")

  def customEvent(id: Long): CustomEvent =
    customEvents.getOrElse(id, throw Json.JsonError(s"unknown custom event id $id"))

  /** `"group": N` request field → physical column (reference DTOs
    * carry the group index end to end). */
  def groupColumn(idx: Int): String =
    if (idx >= 0 && idx < groupCols.size) groupCols(idx)
    else throw Json.JsonError(
      s"unknown group index $idx (configured groups: 0..${groupCols.size - 1})")

  def withProperty(m: PropertyMeta): Registry =
    new Registry(props + (m.name.toLowerCase -> m), customEvents, eventNames, strict, groupCols, eventProperties, groupProps)

  /** Drop a property by display name (reference metadata/src/
    * properties.rs delete — tombstones; immutable registries just
    * produce a copy without the entry). */
  def withoutProperty(name: String): Registry =
    new Registry(props - name.toLowerCase, customEvents, eventNames, strict,
      groupCols,
      // association values hold DISPLAY names but must strip under the
      // same case-insensitive addressing the props map uses — an
      // exact-case filter would leave a ghost association behind a
      // delete addressed as 'revenue' for stored 'Revenue'
      eventProperties.view.mapValues(_.filterNot(_.equalsIgnoreCase(name))).toMap,
      groupProps)

  /** Re-display a property: same physical column and flags, new
    * logical name (the reference's UpdatePropertyRequest.display_name,
    * platform/src/properties.rs:330-338). Rejects a rename onto an
    * existing display name — the same shadowing hazard Registry.apply
    * guards at construction. */
  def renameProperty(name: String, newName: String): Registry = {
    val m = props.getOrElse(name.toLowerCase,
      throw Json.JsonError(s"unknown property '$name'"))
    if (newName.toLowerCase != name.toLowerCase && props.contains(newName.toLowerCase))
      throw Json.JsonError(s"display name '$newName' already in use")
    new Registry(props - name.toLowerCase + (newName.toLowerCase -> m.copy(name = newName)),
      customEvents, eventNames, strict, groupCols,
      eventProperties.view.mapValues(s =>
        if (s.exists(_.equalsIgnoreCase(name)))
          s.filterNot(_.equalsIgnoreCase(name)) + newName
        else s).toMap,
      groupProps)
  }

  /** Add / remove a known event name (reference metadata/src/events.rs
    * create/delete; an empty set disables validation, so removal of
    * the last name degrades to open rather than rejecting all). */
  def withEventName(name: String): Registry =
    new Registry(props, customEvents, eventNames + name, strict, groupCols, eventProperties, groupProps)
  def withoutEventName(name: String): Registry =
    new Registry(props, customEvents, eventNames - name, strict, groupCols,
      eventProperties - name, groupProps)

  def withoutCustomEvent(id: Long): Registry =
    new Registry(props, customEvents - id, eventNames, strict, groupCols, eventProperties, groupProps)

  def withCustomEvent(id: Long, ce: CustomEvent): Registry = {
    Registry.validateCustomEvent(ce)
    new Registry(props, customEvents + (id -> ce), eventNames, strict, groupCols, eventProperties, groupProps)
  }

  /** Attach / detach a property to an event (reference events.rs
    * try_attach_property/try_detach_property — duplicate attach and
    * detach-of-unattached are errors there too). Both sides must
    * exist: an association onto a ghost would silently vanish on the
    * next rename/delete remap. */
  def withEventProperty(event: String, prop: String): Registry = {
    if (strict && eventNames.nonEmpty && !eventNames.contains(event))
      throw Json.JsonError(s"unknown event '$event'")
    property(prop)  // throws on unknown property in strict registries
    val cur = eventProperties.getOrElse(event, Set.empty)
    if (cur.contains(prop))
      throw Json.JsonError(s"property '$prop' already attached to '$event'")
    new Registry(props, customEvents, eventNames, strict, groupCols,
      eventProperties + (event -> (cur + prop)), groupProps)
  }

  def withoutEventProperty(event: String, prop: String): Registry = {
    val cur = eventProperties.getOrElse(event, Set.empty)
    if (!cur.contains(prop))
      throw Json.JsonError(s"property '$prop' is not attached to '$event'")
    new Registry(props, customEvents, eventNames, strict, groupCols,
      eventProperties + (event -> (cur - prop)), groupProps)
  }

  /** Configure the group-dimension columns (index 0 stays the user
    * dimension by convention). Namespaces for dropped trailing groups
    * are discarded; new groups start empty. */
  def withGroupColumns(cols: Seq[String]): Registry = {
    require(cols.nonEmpty, "at least one group dimension (users) is required")
    new Registry(props, customEvents, eventNames, strict, cols, eventProperties,
      groupProps.take(cols.size))
  }

  // ---- per-group property namespaces (reference properties.rs
  // attach_group_routes; each group dimension owns an independent
  // display-name map, so homonyms across groups never collide) ----

  private def requireGroup(idx: Int): Unit =
    if (idx < 0 || idx >= groupCols.size)
      throw Json.JsonError(
        s"unknown group index $idx (configured groups: 0..${groupCols.size - 1})")

  /** Resolve `{"propertyType": "group", "group": idx}` refs: the
    * group's own namespace wins; unknown names fall back to the shared
    * event namespace (one table schema backs every dimension here). */
  def groupProperty(idx: Int, name: String): PropertyMeta = {
    requireGroup(idx)
    groupProps.lift(idx).flatMap(_.get(name.toLowerCase)).getOrElse(property(name))
  }

  def groupPropertyColumn(idx: Int, name: String): String =
    groupProperty(idx, name).column

  /** Group idx's own namespace entries (NOT the shared fallback) —
    * what `GET /schema/group-properties/:group_id` lists. */
  def groupProperties(idx: Int): Seq[PropertyMeta] = {
    requireGroup(idx)
    groupProps.lift(idx).map(_.values.toSeq.sortBy(_.name)).getOrElse(Nil)
  }

  /** Register (or replace) a property in group idx's namespace. */
  def withGroupProperty(idx: Int, m: PropertyMeta): Registry = {
    requireGroup(idx)
    val padded = groupProps.padTo(idx + 1, Map.empty[String, PropertyMeta])
    new Registry(props, customEvents, eventNames, strict, groupCols, eventProperties,
      padded.updated(idx, padded(idx) + (m.name.toLowerCase -> m)))
  }

  def withoutGroupProperty(idx: Int, name: String): Registry = {
    requireGroup(idx)
    if (!groupProps.lift(idx).exists(_.contains(name.toLowerCase)))
      throw Json.JsonError(s"group $idx property '$name' not found")
    new Registry(props, customEvents, eventNames, strict, groupCols, eventProperties,
      groupProps.updated(idx, groupProps(idx) - name.toLowerCase))
  }

  /** Re-display a group property — duplicate display names are only
    * rejected WITHIN the group's namespace (cross-group homonyms are
    * the whole point of the split). */
  def renameGroupProperty(idx: Int, name: String, newName: String): Registry = {
    requireGroup(idx)
    val ns = groupProps.lift(idx).getOrElse(Map.empty)
    val m = ns.getOrElse(name.toLowerCase,
      throw Json.JsonError(s"group $idx property '$name' not found"))
    if (newName.toLowerCase != name.toLowerCase && ns.contains(newName.toLowerCase))
      throw Json.JsonError(s"display name '$newName' already in use in group $idx")
    new Registry(props, customEvents, eventNames, strict, groupCols, eventProperties,
      groupProps.updated(idx, ns - name.toLowerCase + (newName.toLowerCase -> m.copy(name = newName))))
  }

  def allProperties: Seq[PropertyMeta] = props.values.toSeq.sortBy(_.name)
}

object Registry {
  /** No metadata: every name resolves to itself, nothing validates —
    * the single-tenant physical-addressing mode. */
  val open: Registry = new Registry(Map.empty, Map.empty, Set.empty, strict = false)

  /** Reference metadata/src/custom_events.rs:42 `MAX_EVENTS_LEVEL=3`. */
  val MaxCustomEventLevel = 3

  /** Guard a custom-event definition as it enters the registry
    * (reference metadata/src/custom_events.rs:75-110 validate_events):
    * nesting deeper than [[MaxCustomEventLevel]] is rejected, and a
    * member graph that revisits a custom event — the reference errors
    * on ANY re-reference, which also covers true cycles (only
    * constructible here via lazy self-reference, since members embed
    * definitions by value) — fails fast instead of overflowing the
    * stack when `Exprs.customEventPredicate` expands it at plan
    * build. */
  def validateCustomEvent(ce: CustomEvent): Unit = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[CustomEvent, java.lang.Boolean]())
    def walk(c: CustomEvent, level: Int): Unit = {
      if (level > MaxCustomEventLevel)
        throw Json.JsonError(s"max level exceeded: $MaxCustomEventLevel")
      if (!seen.add(c))
        throw Json.JsonError(
          s"custom event '${c.name}' is referenced more than once (cycle or duplicate)")
      c.members.foreach {
        case CustomEventMember.Custom(inner) => walk(inner, level + 1)
        case _: CustomEventMember.Event      =>
      }
    }
    walk(ce, 0)
  }

  def apply(props: Seq[PropertyMeta],
            customEvents: Map[Long, CustomEvent] = Map.empty,
            eventNames: Set[String] = Set.empty,
            strict: Boolean = true): Registry = {
    // Two columns sharing one display name would silently shadow each
    // other in the name→column map — a JSON request addressing the
    // first would resolve to the WRONG column. Reject at construction
    // (the output-side "Name 2" disambiguation in Reshape is for
    // result headers, not for addressable metadata).
    val dups = props.groupBy(_.name.toLowerCase).filter(_._2.size > 1)
    if (dups.nonEmpty) {
      val msg = dups.map { case (n, ms) =>
        s"'$n' (columns ${ms.map(_.column).mkString(", ")})"
      }.mkString("; ")
      throw Json.JsonError(s"duplicate display name(s): $msg")
    }
    customEvents.values.foreach(validateCustomEvent)
    new Registry(props.map(m => m.name.toLowerCase -> m).toMap,
      customEvents, eventNames, strict)
  }
}
