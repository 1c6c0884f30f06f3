package graft.engine

import graft.model.{CustomEvent, JsonDsl, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON request entry points — the analog of the reference's HTTP
  * handlers (platform/src/http/event_segmentation.rs:31-40,
  * platform/src/http/funnel.rs): a JSON body arrives, is deserialized
  * and validated against the DTO shapes (graft.model.JsonDsl), and is
  * compiled to a Spark plan. The HTTP transport itself is out of scope
  * (SURVEY.md §2.1) — callers hand the JSON string in directly.
  */
object JsonApi {

  /** JSON event-segmentation request → long-form result frame.
    * A strict `registry` resolves display property names to physical
    * columns and validates event names (Metadata.fromEvents builds
    * one from the table itself). */
  def eventSegmentation(events: DataFrame, json: String,
                        customEvents: Map[Long, CustomEvent] = Map.empty,
                        registry: Registry = Registry.open): DataFrame =
    EventSegmentation.run(events, JsonDsl.eventSegmentation(json, customEvents, registry))

  /** JSON funnel request → long-form per-step result frame. */
  def funnel(spark: SparkSession, events: DataFrame, json: String,
             registry: Registry = Registry.open): DataFrame =
    Funnel.fromModel(spark, events, JsonDsl.funnel(json, registry))

  /** Run a JSON request and serialize the result in the reference's
    * columnar response shape (Response.ColumnarTable.toJson). */
  def eventSegmentationJson(events: DataFrame, json: String): String =
    Response.collect(eventSegmentation(events, json)).toJson
}
