package graft.engine

import graft.model.{EventSegmentationRequest, PropFilter, PropOp, Registry}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dictionary encoding/decoding. The reference stores dictionary-coded
  * string properties as int keys with bidirectional value↔key maps in
  * RocksDB (reference metadata/src/dictionaries.rs:40-207) and decodes
  * at plan exit via `DictionaryDecodeNode` (reference
  * physical_plan/dictionary_decode.rs:46,167-222 — a lookup join).
  *
  * Spark build: a dictionary IS a DataFrame (value, key). Encode and
  * decode are broadcast hash joins — the direct distributed analog of
  * the reference's per-batch RocksDB lookups, with the dictionary
  * shipped once per executor instead of queried per row. Parquet also
  * dictionary-encodes strings transparently at the storage layer, so
  * encoding is a modeling choice, not a storage necessity.
  */
object Dictionary {

  /** Build a dictionary for a column: distinct values keyed 1..N in
    * value order (deterministic). One shuffle for distinct + one
    * range-partitioned sort; keys come from `zipWithIndex` over the
    * sorted partitions — no single-task global window (a
    * `row_number().over(Window.orderBy(...))` here would funnel every
    * distinct value through one partition, the scale killer for
    * high-cardinality columns). */
  def build(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(valueCol).as("value"))
      .filter(col("value").isNotNull).distinct()
      .orderBy(col("value"))
    val valueField = distinct.schema.fields.head
    // zipWithIndex numbers rows in partition order; the sort above makes
    // partition order = global value order, so keys are deterministic
    val keyed = distinct.rdd.zipWithIndex.map { case (r, i) => Row(r.get(0), i + 1L) }
    spark.createDataFrame(keyed,
      StructType(Seq(valueField.copy(name = "value"), StructField("key", LongType))))
  }

  /** Replace `valueCol` with its dictionary key (null-safe: unseen /
    * null values stay null, mirroring the reference's null handling). */
  def encode(df: DataFrame, dict: DataFrame, valueCol: String,
             keyCol: String): DataFrame =
    df.join(broadcast(dict.select(col("value").as(valueCol), col("key").as(keyCol))),
        Seq(valueCol), "left")
      .drop(valueCol)

  /** Key column → string value (the reference's DictionaryDecodeNode). */
  def decode(df: DataFrame, dict: DataFrame, keyCol: String,
             valueCol: String): DataFrame =
    df.join(broadcast(dict.select(col("key").as(keyCol), col("value").as(valueCol))),
        Seq(keyCol), "left")
      .drop(keyCol)

  /** Dict key of one literal value — a plan-build-time driver lookup
    * over the |values|-sized dictionary (the analog of the reference's
    * per-literal `get_key`, metadata/src/dictionaries.rs). A value the
    * dictionary has never seen returns -1: no row carries that key,
    * so Eq matches nothing and Neq keeps every row — the reference's
    * get_key-miss semantics. */
  def keyOf(dict: DataFrame, value: Any): Long =
    dict.filter(col("value") === lit(value)).select(col("key"))
      .collect().headOption.map(_.getLong(0)).getOrElse(-1L)

  /** Registry-driven filter auto-encode (reference query/src/expr.rs:
    * 168-204): a filter addressing a dictionary-coded property
    * compares LITERALS, so the literals — not the column — translate
    * to dict keys at plan build. The rewritten comparison runs on the
    * integer key column and pushes down to the parquet scan. Only
    * equality-class ops encode (Eq/Neq — order and pattern ops need
    * the decoded string; the reference decodes the column for those,
    * expr.rs:547-587, and so should callers). */
  def encodeFilters(filters: Seq[PropFilter], registry: Registry,
                    dicts: Map[String, DataFrame]): Seq[PropFilter] =
    filters.map { f =>
      val isDict = registry.allProperties.exists(m => m.column == f.column && m.isDictionary)
      dicts.get(f.column) match {
        case Some(dict) if isDict && (f.op == PropOp.Eq || f.op == PropOp.Neq) =>
          f.copy(values = f.values.map(keyOf(dict, _)))
        case _ => f
      }
    }

  /** [[encodeFilters]] over every filter position of an
    * event-segmentation request (request-level and per-block). */
  def encodeRequest(req: EventSegmentationRequest, registry: Registry,
                    dicts: Map[String, DataFrame]): EventSegmentationRequest =
    req.copy(
      filters = encodeFilters(req.filters, registry, dicts),
      events = req.events.map(b => b.copy(filters = encodeFilters(b.filters, registry, dicts))))
}
