package graft.engine

import graft.model.{CustomEvent, PropertyMeta, Registry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StringType

/** Registry construction — the auto-create-on-ingest analog: the
  * reference's ingester creates property/event metadata rows the
  * first time a name appears (metadata/src/properties.rs:585-631);
  * on Spark the table schema already IS that record, so the registry
  * derives from it, with optional display names layered on top.
  */
object Metadata {

  private val SystemCols = Set("event_id", "ts", "user_id", "project_id", "event_date")

  /** Build a strict registry from an events table: one property per
    * column (display-name overrides applied), string columns flagged
    * dictionary-codable, event names read from the event column
    * (small distinct set — the reference keeps the same list in its
    * events table). */
  def fromEvents(df: DataFrame, eventCol: String = "event_type",
                 display: Map[String, String] = Map.empty,
                 customEvents: Map[Long, CustomEvent] = Map.empty,
                 strict: Boolean = true,
                 /** Driver-collect guard: event-name cardinality is
                   * small by design, but a mis-typed column (user ids,
                   * free text) would pull the full distinct set to the
                   * driver. Above the cap, name validation is DISABLED
                   * (unknown names pass) rather than wrongly rejecting
                   * unseen ones, and a warning is logged. */
                 maxEventNames: Int = 10000): Registry = {
    val props = df.schema.fields.toSeq.map { f =>
      PropertyMeta(
        name = display.getOrElse(f.name, f.name),
        column = f.name,
        dataType = f.dataType.simpleString,
        isDictionary = f.dataType == StringType,
        isSystem = SystemCols(f.name))
    }
    val eventNames =
      if (df.columns.contains(eventCol)) {
        val names = df.select(eventCol).filter(org.apache.spark.sql.functions.col(eventCol).isNotNull)
          .distinct().limit(maxEventNames + 1).collect().map(_.getString(0)).toSet
        if (names.size > maxEventNames) {
          System.err.println(
            s"[graft] '$eventCol' has more than $maxEventNames distinct values; " +
              "event-name validation disabled for this registry")
          Set.empty[String]
        } else names
      } else Set.empty[String]
    Registry(props, customEvents, eventNames, strict)
  }
}
