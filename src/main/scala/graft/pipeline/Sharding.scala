package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the last step of a training-data
  * pipeline: assign every document to a fixed-token-budget shard so
  * downstream loaders stream near-uniform files. Documents are never
  * split; a document belongs to the shard its running token offset
  * starts in, so each shard's payload is `budget ± max_doc_tokens`.
  *
  * The naive formulation — `floor(sum(tokens) OVER (ORDER BY key) /
  * budget)` — needs a GLOBAL ordered window, which Spark executes in a
  * SINGLE partition: the whole corpus funnels through one task, a
  * non-starter at 100 TB. The scale-safe shape is a distributed
  * prefix-sum:
  *
  *   1. bucket each doc by a deterministic hash of its id (`B`
  *      buckets);
  *   2. one partial-aggregated `groupBy(bucket)` yields `B` token
  *      totals — `B` rows to the driver, independent of corpus size;
  *   3. the driver computes each bucket's EXCLUSIVE prefix offset
  *      (a `B`-element scan) and broadcast-joins it back;
  *   4. a window PARTITIONED BY bucket (never global) adds the
  *      within-bucket exclusive running sum.
  *
  * Global position = bucket offset + within-bucket running sum, under
  * the total order (bucket, id) — identical on any cluster layout, so
  * shard assignment is reproducible run-to-run and engine-to-engine
  * (the SQL oracle recomputes it with one ordered window, affordable
  * at oracle scale).
  *
  * The md5-derived bucket matches the DuckDB oracle digit-for-digit
  * (same bridge as [[Sampling.hashGate]]).
  */
object Sharding {

  /** Portable bucket in [0, buckets): first 4 md5 hex digits of the
    * id, mod buckets. */
  def bucketOf(idCol: Column, buckets: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % buckets

  /** Returns the input columns plus `shard_id`.
    *
    * @param tokenCol token count expression (e.g.
    *   `size(split(col("text"), " ")).cast("long")`) — evaluated once
    *   and carried, never recomputed per phase
    * @param buckets  prefix-sum fan-out. More buckets = smaller
    *   per-bucket windows (better parallelism) at the cost of a
    *   longer driver scan; the driver work is O(buckets) and the
    *   collected frame is `buckets` rows regardless of corpus size.
    */
  def packShards(df: DataFrame, idCol: String, tokenCol: Column,
                 budgetTokens: Long, buckets: Int = 256): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val temps = Seq("__tok", "__bucket", "__boff", "__start")
    (temps :+ "shard_id").foreach(c => require(!df.columns.contains(c),
      s"input already has a column named '$c' — rename it before packing"))
    val spark = df.sparkSession
    import spark.implicits._

    val withB = df
      // a null token count packs as 0 (the doc still gets a shard);
      // a null id cannot be ordered or bucketed — fail loudly below
      .withColumn("__tok", coalesce(tokenCol.cast("long"), lit(0L)))
      .withColumn("__bucket", bucketOf(col(idCol), buckets))

    // phase 1+2: per-bucket totals (one partial-agg shuffle, `buckets`
    // rows out) → exclusive prefix offsets on the driver
    val totals = withB.groupBy(col("__bucket"))
      .agg(sum(col("__tok")).as("__btot"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"null $idCol in input: documents cannot be deterministically packed")
        r.getLong(0) -> r.getLong(1)
      }
      .sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.scanLeft(0L)(_ + _._2).init)
    val offsetsDf = offsets.toSeq.toDF("__bucket", "__boff")

    // phase 3: broadcast the tiny offset table, then a PER-BUCKET
    // exclusive running sum — the only corpus-sized shuffle is the
    // window's hash partition on __bucket
    val w = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .join(broadcast(offsetsDf), "__bucket")
      .withColumn("__start",
        coalesce(sum(col("__tok")).over(w), lit(0L)) + col("__boff"))
      // exact long floor-division (both operands nonnegative): a
      // double round-trip would lose exactness past 2^53 cumulative
      // tokens, silently shifting docs across shard boundaries
      .withColumn("shard_id", expr(s"__start div ${budgetTokens}"))
      .drop("__tok", "__bucket", "__boff", "__start")
  }
}
