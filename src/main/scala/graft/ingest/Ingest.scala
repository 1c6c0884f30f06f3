package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Batch ingestion — the Spark build of the reference's ingester crate
  * (reference ingester/src/executor.rs:120-263 `Executor<Track>`,
  * :265-330 `Executor<Identify>`; transformers
  * ingester/src/transformers/user_agent/mod.rs:20-110 and
  * ingester/src/transformers/geo/mod.rs:15-54).
  *
  * The reference ingests one HTTP request at a time: resolve the
  * project by token, get-or-create the user (and each group value) in
  * RocksDB, create dictionary keys, enrich with user-agent and GeoIP
  * properties, then insert one denormalized event row. The Spark-first
  * translation is set-at-a-time: a micro-batch (or backfill) of raw
  * track records becomes a DataFrame, and every per-record RocksDB
  * round-trip becomes one distributed join / aggregate over the whole
  * batch:
  *
  *  - get_or_create(user_key)  → one groupBy(first-seen) + anti-join
  *    against the existing identity snapshot + sorted zipWithIndex id
  *    assignment (no per-record lock, no global window);
  *  - uaparser regex lookup    → a codegen'd when-chain of
  *    `regexp_extract` columns (no UDF);
  *  - MaxMind range lookup     → a broadcast equi-join on the /8
  *    prefix bucket each range covers, then the exact range filter —
  *    the skew-safe, whole-stage-codegen form of an interval join;
  *  - destination insert       → the denormalized output DataFrame,
  *    written with `Store` (append) like any other batch.
  *
  * At 100 TB the identity snapshot is the only shared state; it is
  * |users|-sized (ids + keys only), lives as a parquet table, and the
  * per-batch work is one shuffle of (key, min seq) pairs — the raw
  * event payload is never shuffled for resolution.
  */
object Ingest {

  // ---------------------------------------------------------------
  // Identity resolution (reference metadata/src/groups.rs:129
  // get_or_create; executor.rs:135-185 wires it per request)
  // ---------------------------------------------------------------

  /** Resolve every raw key to a stable numeric id. Keys present in
    * `existing` (schema: keyCol, id) keep their id; unseen keys are
    * assigned max(existing.id) + rank over (first-seen sequence, key)
    * — the deterministic batch analog of the reference's monotonic
    * RocksDB `next_id` counter. The rank comes from zipWithIndex over
    * range-sorted partitions, not a single-task global window.
    * Returns the complete (keyCol, id) mapping.
    *
    * The mapping's shared subplans (`existing`, the rank-assigned new
    * keys) are persisted for the life of the action — both are
    * |keys|-sized (keys + ids only, never the raw payload), and
    * without the cache every downstream reference would re-run the
    * full upstream chain, because the rank assignment crosses an RDD
    * boundary that severs Catalyst's common-subplan/exchange reuse.
    * Long-lived sessions that loop over batches should release the
    * caches afterwards ([[streamingTrack]] does, per micro-batch). */
  def resolveIdentities(raw: DataFrame, existing: DataFrame,
                        keyCol: String = "user_key",
                        seqCol: String = "seq"): DataFrame =
    resolveIdentitiesCached(raw, existing, keyCol, seqCol)._1

  /** [[resolveIdentities]] plus a release handle that unpersists the
    * action-scoped caches. One-shot callers may ignore it (two
    * |keys|-sized frames linger until session end); anything that
    * LOOPS over batches — a service, a driver harness — must call it
    * after each batch's action completes, exactly as
    * [[streamingTrack]] does per micro-batch. */
  def resolveIdentitiesCached(raw: DataFrame, existing: DataFrame,
                              keyCol: String = "user_key",
                              seqCol: String = "seq"): (DataFrame, () => Unit) = {
    val (mapping, assigned, cachedExisting) =
      resolveParts(raw, existing, keyCol, seqCol)
    (mapping, () => { assigned.unpersist(); cachedExisting.unpersist(); () })
  }

  /** (full mapping, newly-assigned rows only, cached existing ids) —
    * the streaming path appends the second directly instead of
    * re-deriving it with another anti-join, and unpersists the second
    * and third once the micro-batch's action completes. */
  private def resolveParts(raw: DataFrame, existing: DataFrame,
                           keyCol: String, seqCol: String): (DataFrame, DataFrame, DataFrame) = {
    // Cache the snapshot: it is referenced by the anti-join AND the
    // union arm of the mapping (and `existing` is often itself an
    // expensive derived frame). The one-row eager max both reads the
    // id high-water mark — the reference's monotonic `next_id`
    // counter (metadata/src/groups.rs:129) — and materializes the
    // cache in the same small job, so the whole chain computes ONCE
    // per batch instead of once per plan reference.
    val existingIds = existing.select(col(keyCol), col("id").cast(LongType).as("id"))
      .persist()
    val maxId = existingIds.agg(coalesce(max(col("id")), lit(0L))).first().getLong(0)
    val firstSeen = raw.groupBy(col(keyCol))
      .agg(min(col(seqCol)).as("first_seq"))
    val newKeys = firstSeen
      .join(existingIds.select(col(keyCol)), Seq(keyCol), "left_anti")
    // rankRows' RDD boundary makes `assigned` recompute per reference
    // (union arm + any caller-side joins); cache it too — it holds
    // only the batch's UNSEEN keys, the smallest frame in the plan.
    val assigned = graft.engine.Dictionary
      .rankRows(newKeys, Seq(col("first_seq"), col(keyCol)), "id", startAt = maxId)
      .select(col(keyCol), col("id"))
      .persist()
    (existingIds.unionByName(assigned), assigned, existingIds)
  }

  /** Anonymous-id merge (reference groups.rs:70 `merge_with_anonymous`;
    * executor.rs:169-178): a record carrying both ids binds the
    * anonymous key to the real user's id; records carrying only the
    * anonymous key then resolve through that binding. `bindings` =
    * rows of (anonCol, keyCol) from the current batch; their real
    * keys must already be in `mapping` (run [[resolveIdentities]]
    * over the batch first, as [[executeTrackBatch]] does — the
    * reference likewise creates the group before merging). An
    * anonymous key that collides with an existing real key keeps the
    * real key's id (no duplicate mapping rows). */
  def mergeAnonymous(mapping: DataFrame, bindings: DataFrame,
                     anonCol: String = "anonymous_key",
                     keyCol: String = "user_key"): DataFrame = {
    val bound = bindings
      .groupBy(col(anonCol)).agg(min(col(keyCol)).as(keyCol))
      .join(mapping, Seq(keyCol))
      .select(col(anonCol).as(keyCol), col("id"))
      .join(mapping.select(col(keyCol)), Seq(keyCol), "left_anti")
    mapping.unionByName(bound)
  }

  // ---------------------------------------------------------------
  // User-agent transformer (reference transformers/user_agent/
  // mod.rs:20-110 — uaparser regexes → client/os/device properties)
  // ---------------------------------------------------------------

  /** Parse a user-agent string into the property set the reference's
    * UA transformer emits (client family/major/minor, os family,
    * device family). uaparser's regexes.yaml is a large ordered rule
    * list; this is the compact ordered subset covering the major
    * engines — each rule is a `contains` guard + `regexp_extract`,
    * all codegen'd, first match wins (Edge and Opera ship "Chrome/"
    * in the UA so they must precede it; iPhone UAs contain
    * "like Mac OS X" so iOS precedes macOS; Android UAs contain
    * "Linux;" so Android precedes Linux). */
  def parseUserAgent(ua: Column): Column = {
    def has(t: String): Column = ua.contains(t)
    val family =
      when(has("Edg/"), "Edge")
        .when(has("OPR/"), "Opera")
        .when(has("Firefox/"), "Firefox")
        .when(has("Chrome/"), "Chrome")
        .when(has("Version/") && has("Safari/"), "Safari")
        .otherwise("Other")
    def ver(group: Int): Column =
      when(has("Edg/"), regexp_extract(ua, "Edg/([0-9]+)\\.([0-9]+)", group))
        .when(has("OPR/"), regexp_extract(ua, "OPR/([0-9]+)\\.([0-9]+)", group))
        .when(has("Firefox/"), regexp_extract(ua, "Firefox/([0-9]+)\\.([0-9]+)", group))
        .when(has("Chrome/"), regexp_extract(ua, "Chrome/([0-9]+)\\.([0-9]+)", group))
        .when(has("Version/") && has("Safari/"),
          regexp_extract(ua, "Version/([0-9]+)\\.([0-9]+)", group))
        .otherwise(lit(""))
    val os =
      when(has("Windows NT"), "Windows")
        .when(has("Android"), "Android")
        .when(has("iPhone OS"), "iOS")
        .when(has("Mac OS X"), "Mac OS X")
        .when(has("Linux"), "Linux")
        .otherwise("Other")
    val device =
      when(has("iPhone"), "iPhone")
        .when(has("Android") && has("Mobile"), "Generic Smartphone")
        .otherwise("Other")
    struct(
      family.as("client_family"),
      ver(1).as("client_version_major"),
      ver(2).as("client_version_minor"),
      os.as("os_family"),
      device.as("device_family"))
  }

  // ---------------------------------------------------------------
  // Geo transformer (reference transformers/geo/mod.rs:15-54 —
  // MaxMind city lookup → country/city properties)
  // ---------------------------------------------------------------

  /** Number of addresses per /8 prefix bucket. */
  private val PrefixWidth = 16777216L

  /** Explode an IP-range table (start, end, attrs…) into the /8
    * prefix buckets each range covers, so the lookup becomes a
    * broadcast EQUI-join on the bucket instead of a nested-loop
    * interval join. A GeoIP city table is ~3M ranges → ~tens of M
    * bucket rows of a few slim columns — still broadcastable, and the
    * per-row probe is a hash lookup + two comparisons. */
  def explodeRangesToPrefixes(ranges: DataFrame): DataFrame =
    ranges.withColumn("ip_prefix",
      explode(sequence(col("start").divide(PrefixWidth).cast(LongType),
                       col("end").divide(PrefixWidth).cast(LongType))))

  /** Enrich `df` with the attributes of the (non-overlapping) range
    * containing `ipCol`. The exact bounds check lives in the JOIN
    * condition, not a post-filter, so an address that shares a bucket
    * with a range but falls outside it (or in a coverage gap) keeps
    * null attrs — the reference skips the properties when the MaxMind
    * lookup misses.
    *
    * The broadcast hint is GATED: a city-level MaxMind table (~3M
    * ranges) resolves to millions of bucket rows — hundreds of MB
    * resident on every executor, past the comfortable broadcast edge.
    * The gate reads Catalyst's size ESTIMATE of the ranges table
    * (`optimizedPlan.stats.sizeInBytes` — parquet footer / local-rows
    * arithmetic, NO Spark job at plan build for any frame with real
    * stats; every streaming micro-batch builds this DataFrame). The
    * estimate is padded 4× before the comparison — parquet's on-disk
    * size understates resident row memory severalfold — and remains a
    * sound proxy for the exploded size: non-overlapping IPv4 ranges
    * cross at most 255 /8 boundaries in total, so explosion adds
    * ≤ 256 rows regardless of table size.
    *
    * RDD-backed / checkpointed frames report the `defaultSizeInBytes`
    * SENTINEL (no estimate at all); treating that as "too big" would
    * silently drop the hint and shuffle every micro-batch for what is
    * usually a small static table. Sentinel stats instead fall back
    * to a row-count gate: one bounded `limit(N+1).count()` over the
    * un-exploded ranges (N = budget / ~64 B per resident row) decides.
    * Above either gate the hint is dropped and the lookup runs as a
    * shuffle equi-join on the prefix bucket, which AQE can still
    * convert or skew-split at runtime. */
  def geoEnrich(df: DataFrame, ipCol: String, ranges: DataFrame,
                maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val exploded = explodeRangesToPrefixes(ranges)
    val stats = ranges.queryExecution.optimizedPlan.stats
    val isSentinel = stats.sizeInBytes >= BigInt(Long.MaxValue) / 2
    val fits =
      if (!isSentinel) stats.sizeInBytes * 4 <= maxBroadcastBytes
      else {
        val maxRows = maxBroadcastBytes / 64L
        val probe = math.min(maxRows + 1L, Int.MaxValue.toLong - 1L).toInt.max(1)
        ranges.limit(probe).count() <= maxRows
      }
    val pref = if (fits) broadcast(exploded) else exploded
    val keyed = df.withColumn("ip_prefix",
      col(ipCol).divide(PrefixWidth).cast(LongType))
    keyed.join(pref,
        keyed("ip_prefix") === pref("ip_prefix") &&
          keyed(ipCol) >= pref("start") && keyed(ipCol) <= pref("end"),
        "left")
      .drop(pref("ip_prefix"))
      .drop("ip_prefix", "start", "end")
  }

  // ---------------------------------------------------------------
  // Track executor (reference executor.rs:120-263): resolve → enrich
  // → denormalize
  // ---------------------------------------------------------------

  /** Transformer stage shared by the batch and streaming executors:
    * UA parse + geo range enrichment over already-resolved rows. */
  private def enrich(resolved: DataFrame, geoRanges: DataFrame,
                     uaCol: String, ipCol: String): DataFrame = {
    val withUa = resolved
      .withColumn("ua_parsed", parseUserAgent(col(uaCol)))
      .select((resolved.columns.map(col).toSeq :+ col("ua_parsed.*")): _*)
    geoEnrich(withUa, ipCol, geoRanges)
  }

  /** The batch form of `Executor<Track>::execute`: resolve user ids,
    * apply the UA and geo transformers, and emit the denormalized
    * event rows a destination would append. `geoRanges` columns:
    * (start, end, country, city). Looping callers should use
    * [[executeTrackBatchCached]] and release after each batch. */
  def executeTrackBatch(raw: DataFrame, existing: DataFrame, geoRanges: DataFrame,
                        keyCol: String = "user_key", seqCol: String = "seq",
                        uaCol: String = "ua", ipCol: String = "ip"): DataFrame =
    executeTrackBatchCached(raw, existing, geoRanges, keyCol, seqCol, uaCol, ipCol)._1

  /** [[executeTrackBatch]] with the identity-cache release handle
    * (see [[resolveIdentitiesCached]]). */
  def executeTrackBatchCached(raw: DataFrame, existing: DataFrame, geoRanges: DataFrame,
                              keyCol: String = "user_key", seqCol: String = "seq",
                              uaCol: String = "ua", ipCol: String = "ip")
      : (DataFrame, () => Unit) = {
    val (mapping, release) = resolveIdentitiesCached(raw, existing, keyCol, seqCol)
    val resolved = raw.join(mapping.withColumnRenamed("id", "resolved_user_id"),
      Seq(keyCol))
    (enrich(resolved, geoRanges, uaCol, ipCol), release)
  }

  /** Load the persisted identity snapshot, or an empty mapping if
    * none has been written yet. The existence probe goes through the
    * Hadoop FileSystem API so snapshot dirs on any supported scheme
    * (file://, hdfs://, s3a://) behave identically — a local-only
    * java.io.File check would silently restart id assignment every
    * batch on object storage. */
  def loadSnapshot(spark: org.apache.spark.sql.SparkSession, dir: String,
                   keyCol: String = "user_key"): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(path) &&
      fs.listStatus(path).exists(_.getPath.getName.endsWith(".parquet"))
    if (exists) spark.read.parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("id", LongType))))
  }

  /** Streaming Track executor: the reference ingests one HTTP request
    * at a time (executor.rs:120); here each micro-batch runs the same
    * resolve→enrich→denormalize pipeline via foreachBatch, with the
    * identity mapping persisted as a parquet snapshot that grows by
    * the batch's unseen keys. A retried batch is harmless: its keys
    * are already in the snapshot, so the anti-join appends nothing
    * and re-resolution yields the identical ids (ids derive from the
    * snapshot, never from batch randomness).
    *
    * The snapshot append is ATOMIC per batch: assignments are written
    * to a temp dir and the single part file renamed into the snapshot
    * as `batch-<id>.parquet` (rename is atomic on local/HDFS; a torn
    * write leaves only the temp dir, which the next attempt
    * overwrites). A retry after a successful rename sees the file
    * already present and skips — a failure at ANY point yields either
    * the whole batch's assignments or none, never a partial snapshot
    * that would shift later ids. Object stores without atomic rename
    * would use a transactional table (Delta); the resolution math is
    * unchanged.
    *
    * Returns a started-able writer; the caller picks trigger/
    * checkpoint and calls .start(). */
  def streamingTrack(raw: DataFrame, snapshotDir: String, geoRanges: DataFrame,
                     keyCol: String = "user_key", seqCol: String = "seq",
                     uaCol: String = "ua", ipCol: String = "ip")(
                     sink: (DataFrame, Long) => Unit) =
    raw.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val existing = loadSnapshot(spark, snapshotDir, keyCol)
      // resolveParts persists both the snapshot and the new
      // assignments for the duration of the batch: the snapshot
      // append materializes the assignments AND the mapping's union
      // arm reuses the cached result — the groupBy/anti-join/rank
      // pipeline never replays for the sink's join
      val (mapping, assigned, cachedExisting) =
        resolveParts(batch, existing, keyCol, seqCol)
      try {
        // new-key sets are batch-sized (keys + ids only) → one file
        graft.sources.Store.atomicAppend(assigned, snapshotDir, s"batch-$batchId")
        val resolved = batch.join(
          mapping.withColumnRenamed("id", "resolved_user_id"), Seq(keyCol))
        sink(enrich(resolved, geoRanges, uaCol, ipCol), batchId)
      } finally { assigned.unpersist(); cachedExisting.unpersist(); () }
    }

  // ---------------------------------------------------------------
  // Sessionization (reference metadata/src/sessions.rs:75-133 — a
  // RocksDB liveness record per (project,user) bumped on every event,
  // swept by a callback that emits synthetic session-end events when
  // the inactivity gap passes)
  // ---------------------------------------------------------------

  /** Batch sessionization: assign a session id per (user, event) using
    * the reference's inactivity-gap rule — an event more than `gap`
    * after the user's previous event starts a new session. `tsCol`
    * must be NUMERIC in the same unit as `gap` (pass `unix_micros(ts)`
    * for timestamp data — a timestamp→long cast would silently give
    * seconds). The set-at-a-time form of the per-event RocksDB bump:
    * one window over (user, ts) — partitioned BY USER, so at 100 TB
    * the work is one shuffle on the user key with no single-task
    * global state — a boundary flag, and a running sum. Returns the
    * input plus `session_seq` (1-based per user). [[sessionEnds]]
    * derives the sweeper's synthetic session-end rows from the same
    * assignment. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gap: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val newSession =
      when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L).otherwise(lit(0L))
    // first event of a user has a null lag → otherwise(0); the +1
    // makes the first session 1-based like the reference's counter
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1L)
  }

  /** Per-session summary rows — what the reference's sweeper callback
    * emits as "session end" events once a session's inactivity gap
    * expires (sessions.rs:104-133; the ingester inserts them as
    * synthetic events). One groupBy on (user, session_seq). */
  def sessionEnds(df: DataFrame, userCol: String, tsCol: String,
                  gap: Long): DataFrame =
    sessionize(df, userCol, tsCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  private val Window = org.apache.spark.sql.expressions.Window

  // ---------------------------------------------------------------
  // Identify executor (reference executor.rs:265-330): group-profile
  // upsert with version bump
  // ---------------------------------------------------------------

  /** Apply a batch of identify records to a profile snapshot. Schema
    * of `profiles`: (keyCol, version, props…); `updates`: (keyCol,
    * seqCol, props…). Per the reference's replacing semantics the
    * LAST update that SET a property wins, null values never
    * overwrite, and the version bumps once per applied record
    * (groups.rs get_or_create bumps on every identify). Unseen keys
    * enter with version = number of their updates. */
  def identifyBatch(profiles: DataFrame, updates: DataFrame, props: Seq[String],
                    keyCol: String = "user_key", seqCol: String = "seq"): DataFrame = {
    val aggs = count(lit(1)).as("n_updates") +:
      props.map(p => max_by(col(p), when(col(p).isNotNull, col(seqCol))).as(p + "__upd"))
    val merged = updates.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val joined = profiles.join(merged, Seq(keyCol), "full_outer")
    joined.select(
      col(keyCol) +:
      (coalesce(col("version"), lit(0L)) + coalesce(col("n_updates"), lit(0L))).as("version") +:
      props.map { p =>
        coalesce(col(p + "__upd"), col(p)).as(p)
      }: _*)
  }
}
