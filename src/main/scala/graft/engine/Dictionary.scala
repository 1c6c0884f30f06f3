package graft.engine

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
}
