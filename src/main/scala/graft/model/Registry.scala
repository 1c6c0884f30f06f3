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
    val groupCols: Seq[String] = Seq("user_id")) {

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
    new Registry(props + (m.name.toLowerCase -> m), customEvents, eventNames, strict, groupCols)

  def withCustomEvent(id: Long, ce: CustomEvent): Registry =
    new Registry(props, customEvents + (id -> ce), eventNames, strict, groupCols)

  /** Configure the group-dimension columns (index 0 stays the user
    * dimension by convention). */
  def withGroupColumns(cols: Seq[String]): Registry = {
    require(cols.nonEmpty, "at least one group dimension (users) is required")
    new Registry(props, customEvents, eventNames, strict, cols)
  }

  def allProperties: Seq[PropertyMeta] = props.values.toSeq.sortBy(_.name)
}

object Registry {
  /** No metadata: every name resolves to itself, nothing validates —
    * the single-tenant physical-addressing mode. */
  val open: Registry = new Registry(Map.empty, Map.empty, Set.empty, strict = false)

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
    new Registry(props.map(m => m.name.toLowerCase -> m).toMap,
      customEvents, eventNames, strict)
  }
}
