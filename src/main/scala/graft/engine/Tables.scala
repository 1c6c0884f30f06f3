package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading. The reference's storage engine (OptiDB LSM,
  * storage/src/db.rs) is replaced wholesale by immutable Parquet read
  * through Spark's vectorized scan — projection pruning and filter
  * pushdown replace the manual projection indices the reference
  * computes per-request (reference query/src/event_segmentation.rs:166-237).
  *
  * At cluster scale the events table would be written partitioned by
  * (project_id, date(ts)) so partition pruning handles the tenant and
  * time filters; the driver-supplied test parquet is a single file, so
  * here pruning happens via parquet row-group min/max statistics instead.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events stream carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects by default; read it as raw ns longs
    * (legacy.parquet.nanosAsLong) and floor-convert to a µs timestamp
    * — the same truncation DuckDB's epoch_us applies, so oracles
    * agree. The conf is dynamic, so this works on any caller session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Make time-range filters on the ns→µs-converted column pushable
    // (graft.plans.NsTimeFilterPushdown); idempotent registration.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NsTimeFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NsTimeFilterPushdown
    // CANONICAL layout preference: a maintained `events_by_date/`
    // sibling (the date-partitioned store the streaming sink writes
    // and Compact.runPartitioned folds) wins over the flat file — the
    // Spark analog of the reference's (project_id, id)-sorted LSM key
    // (cmd/src/lib.rs:230 index_cols) that keeps scans on relevant key
    // ranges. The partition column is dropped so the flat schema is
    // identical either way; time-filtered paths that want directory
    // pruning read through [[eventsWithDate]] instead.
    val sibling = new java.io.File(dir, "events_by_date")
    if (sibling.isDirectory)
      return spark.read.parquet(sibling.getAbsolutePath).drop("event_date")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      // TIMESTAMP_NTZ parquet (isAdjustedToUTC=false): the engine runs
      // with session tz UTC, so the cast is a pure reinterpretation with
      // identical epoch-µs values; downstream unix_micros/unix_millis
      // require TIMESTAMP. NsTimeFilterPushdown re-pushes range filters
      // through this cast onto the raw NTZ column for parquet stats.
      case org.apache.spark.sql.types.TimestampNTZType =>
        // The reinterpretation is only epoch-preserving under UTC; a
        // non-UTC session would silently shift every instant (the same
        // utcSession guard NsTimeFilterPushdown applies to its bounds).
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(java.time.ZoneId.of(tz).normalized() ==
          java.time.ZoneOffset.UTC.normalized(),
          s"events NTZ->TIMESTAMP normalization requires a UTC session " +
            s"timezone (spark.sql.session.timeZone=$tz would shift instants)")
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Per-process staged date-partitioned mirrors, keyed by data dir:
    * the bench/test substitute for a maintained `events_by_date/`
    * sibling when the source dir is read-only (driver testdata).
    * Each mirror lives under a UNIQUE temp directory (no cross-process
    * sharing — two concurrent runs over the same dataset must never
    * overwrite each other's partitions mid-read) and is deleted on JVM
    * shutdown. */
  private val partitionedMirrors =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Root of the canonical tenant+date-partitioned events layout for
    * `dir`: a maintained `events_by_date/` sibling when present, else
    * a once-per-process temp mirror staged from the flat table. The
    * partition layout is `project_id=N/event_date=YYYY-MM-DD/` —
    * project_id LEADING, mirroring the reference's primary sort key
    * `(project_id, id)` (reference cmd/src/lib.rs:230 index_cols;
    * storage/src/table.rs:26-27), because tenancy is the reference's
    * first-class scan bound: [[Exprs.tenantScope]]'s equality
    * predicate lands on the partition column and prunes whole tenant
    * subtrees from the listing, and
    * [[graft.engine.Exprs.timePredicateWithPartitionPruning]] prunes
    * day directories within them — at 100 TB the listing touches only
    * the queried tenant's queried days. A source without a
    * `project_id` column is a single-project deployment and stages
    * under `project_id=1/` (the reference's first project id), so the
    * layout shape is invariant. */
  def eventsPartitionedRoot(spark: SparkSession, dir: String): String = {
    val sibling = new java.io.File(dir, "events_by_date")
    if (sibling.isDirectory) sibling.getAbsolutePath
    else partitionedMirrors.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-events-by-date-").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root)))
      // repartition by the partition columns first: every writer task
      // otherwise emits a file into EVERY leaf directory (tasks×leaves
      // small files, whose per-file open cost then dominates small-SF
      // reads); one shuffle → one file per (tenant, day).
      import org.apache.spark.sql.functions.{col, lit, to_date}
      val ev = events(spark, dir)
      val withTenant =
        if (ev.columns.contains("project_id")) ev
        else ev.withColumn("project_id", lit(1L))
      // in-file (user, ts) sort — Store.writeEvents' contract — gives
      // per-user row-group locality for the funnel/two-level paths
      // and better column compression; row order never changes results.
      // The sort MUST lead with the full partitionBy prefix
      // (project_id, event_date): FileFormatWriter requires its
      // ordering on the partition columns and would otherwise insert
      // its own sort, discarding the (user_id, ts) locality.
      withTenant
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("project_id"), col("event_date"))
        .sortWithinPartitions(col("project_id"), col("event_date"),
          col("user_id"), col("ts"))
        .write.partitionBy("project_id", "event_date").mode("overwrite")
        .parquet(root.getAbsolutePath)
      root.getAbsolutePath
    })
  }

  /** Events read THROUGH the canonical partitioned layout, with the
    * `project_id` and `event_date` partition columns retained
    * (appended after the flat columns) so [[Exprs.tenantScope]] and
    * [[Exprs.timePredicateFor]] upgrade tenant and time filters to
    * partition-pruning conjuncts. The ts column was normalized before
    * the partitioned write, so no NTZ handling applies here. (A
    * maintained `events_by_date/` sibling written before the tenant
    * dimension existed carries only `event_date` — tenantScope is
    * vacuous there, exactly as on the flat table.) */
  def eventsWithDate(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(eventsPartitionedRoot(spark, dir))

  /** CSV source (the reference reads its integration fixtures through
    * a CSV ListingTable, query/src/lib.rs:701-720). */
  def loadCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
