package graft

import java.nio.file.Files

import graft.sources.{Compact, Store}
import org.apache.spark.sql.functions._

/** Leveled compaction semantics (reference storage/src/compaction.rs
  * `determine_compaction` + config.toml defaults): L0 count trigger,
  * level size triggers, row preservation, manifest crash isolation,
  * and append pickup between runs. */
class CompactSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-compact-spec").toString

  /** `n` single-file L0 appends, like n ingest batches. */
  private def appendBatches(dir: String, n: Int): Unit =
    (0 until n).foreach { i =>
      val df = spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") % 7).as("k"))
      Store.atomicAppend(df, dir, f"batch-$i%05d")
    }

  test("L0 count trigger merges appends and preserves every row") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 12)
    val r = Compact.run(spark, dir)
    assert(r.filesBefore == 12 && r.filesAfter < 12)
    assert(r.merges == 1, "12 L0 parts merge once into L1")
    val lv = Compact.levels(spark, dir)
    assert(!lv.contains(0) && lv.contains(1), s"all rows promoted to L1: $lv")
    val got = Compact.read(spark, dir)
    assert(got.count() == 1200)
    // batches cover exactly ids 0..1199, so the sum pins content
    assert(got.agg(sum("id")).head.getLong(0) == 1199L * 1200 / 2)
  }

  test("under the L0 threshold nothing merges; run is idempotent") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 3)
    val r1 = Compact.run(spark, dir)
    assert(r1.merges == 0 && r1.filesAfter == 3)
    val r2 = Compact.run(spark, dir)
    assert(r2.merges == 0 && r2.passes == 0, "stable state replans to nothing")
    assert(Compact.read(spark, dir).count() == 300)
  }

  test("level size trigger cascades L1 into L2 across passes") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 12)
    // tiny caps: every level overflows immediately, so the single L1
    // merge output (split across parts by the part cap) must cascade
    // upward on later passes of the same run
    val o = Compact.Options(l0MaxParts = 4, l1PartBytes = 2048,
      l1MaxLevelBytes = 2048, sizeMultiplier = 2)
    val r = Compact.run(spark, dir, o)
    assert(r.passes >= 2, s"cascade takes multiple passes: $r")
    val lv = Compact.levels(spark, dir, o)
    assert(lv.keys.max >= 2, s"data reached L2+: $lv")
    assert(Compact.read(spark, dir, o).count() == 1200)
  }

  test("merge output orphaned BEFORE the first-ever commit is stale, not adopted") {
    // crash window: first run() renamed merged parts in but died
    // before writing manifest generation 1 — no manifest exists, yet
    // the merged bytes duplicate their still-present inputs
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 3)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val orphan = new org.apache.hadoop.fs.Path(dir, "merged-L1-orphan.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    assert(Compact.read(spark, dir).count() == 300,
      "orphan never double-counts even with no manifest yet")
    Compact.run(spark, dir)
    assert(!fs.exists(orphan), "first run sweeps it")
    assert(Compact.read(spark, dir).count() == 300)
  }

  test("uncommitted merge leftovers are invisible to read and swept by run") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 6)
    Compact.run(spark, dir)
    val good = Compact.read(spark, dir).count()
    // plant a crash leftover: merged-* parquet bytes never committed
    // to any manifest (copy of a live file under a merged name)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val ghost = new org.apache.hadoop.fs.Path(dir, "merged-L9-ghost.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, ghost, false,
      spark.sparkContext.hadoopConfiguration)
    assert(Compact.read(spark, dir).count() == good,
      "uncommitted merge output never double-counts")
    Compact.run(spark, dir)
    assert(!fs.exists(ghost), "next run sweeps the leftover")
  }

  test("runPartitioned compacts each date partition independently") {
    val root = s"${tmpDir()}/events"
    // a partitioned store with per-partition small-file buildup:
    // 6 appended batches in one date dir, 2 in the other
    val day1 = s"$root/event_date=2026-01-01"
    val day2 = s"$root/event_date=2026-01-02"
    (0 until 6).foreach { i =>
      Store.atomicAppend(
        spark.range(i * 10, i * 10 + 10).select(col("id"), (col("id") % 3).as("k")),
        day1, f"b$i%03d")
    }
    (0 until 2).foreach { i =>
      Store.atomicAppend(
        spark.range(1000 + i * 10, 1000 + i * 10 + 10).select(col("id"), (col("id") % 3).as("k")),
        day2, f"b$i%03d")
    }
    val reports = Compact.runPartitioned(spark, root)
    assert(reports.keySet == Set("event_date=2026-01-01", "event_date=2026-01-02"))
    assert(reports("event_date=2026-01-01").merges == 1, "6 L0 parts merge")
    assert(reports("event_date=2026-01-02").merges == 0, "2 parts stay under the trigger")
    // partitioned directory read still sees every row with the
    // partition column attached
    val all = spark.read.parquet(root)
    assert(all.count() == 80)
    assert(all.filter(col("event_date") === "2026-01-01").count() == 60)
  }

  test("replacing merge keeps the latest version per key, like the reference's group tables") {
    import spark.implicits._
    val dir = s"${tmpDir()}/groups"
    // 6 batches re-writing overlapping profile keys at rising versions
    (0 until 6).foreach { b =>
      Store.atomicAppend(
        Seq.tabulate(10)(i => (i.toLong, b.toLong, s"plan-$b")).toDF("gid", "version", "plan"),
        dir, f"b$b%03d")
    }
    val o = Compact.Options(replaceOn = Seq("gid"), versionCol = Some("version"))
    val r = Compact.run(spark, dir, o)
    assert(r.merges == 1)
    val got = Compact.read(spark, dir, o)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 10, "one row per key after the replacing fold")
    assert(got.values.forall(_ == ((5L, "plan-5"))), "the newest version wins")
  }

  test("a replacing store collapses stale rows on READ before any merge folds them") {
    import spark.implicits._
    val dir = s"${tmpDir()}/groups"
    val o = Compact.Options(replaceOn = Seq("gid"), versionCol = Some("version"))
    (0 until 6).foreach { b =>
      Store.atomicAppend(
        Seq.tabulate(5)(i => (i.toLong, b.toLong, s"plan-$b")).toDF("gid", "version", "plan"),
        dir, f"b$b%03d")
    }
    Compact.run(spark, dir, o)
    // a key updated AFTER the fold: old row lives in L1, new in L0
    Store.atomicAppend(Seq((0L, 99L, "plan-new")).toDF("gid", "version", "plan"),
      dir, "late")
    val got = Compact.read(spark, dir, o)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got.size == 5 && got(0L) == "plan-new",
      "reader sees only the newest row per key, like the LSM contract")
  }

  test("a manifest-listed part missing on disk fails loudly, never serves silently") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 6)
    Compact.run(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("merged-")).head
    fs.delete(merged, false) // external corruption
    val e = intercept[IllegalStateException](Compact.read(spark, dir).count())
    assert(e.getMessage.contains("missing manifest-listed parts"))
  }

  test("runPartitioned never descends into _temporary writer bookkeeping") {
    import spark.implicits._
    val root = s"${tmpDir()}/events"
    val day = s"$root/event_date=2026-01-01"
    (0 until 6).foreach { i =>
      Store.atomicAppend(spark.range(i * 10, i * 10 + 10).toDF("id"), day, f"b$i%03d")
    }
    // a crashed (or in-flight) Spark job's task attempt files
    val ghost = s"$root/_temporary/0/attempt_0/part-00000.parquet"
    spark.range(0, 99).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"${tmpDir()}/seed")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_temporary/0/attempt_0"))
    fs.create(new org.apache.hadoop.fs.Path(ghost), true).close()
    val reports = Compact.runPartitioned(spark, root)
    assert(reports.keySet == Set("event_date=2026-01-01"),
      s"only the real partition compacts: ${reports.keySet}")
    assert(fs.exists(new org.apache.hadoop.fs.Path(ghost)),
      "writer bookkeeping untouched")
  }

  test("dictionary stores survive compaction: getOrCreate ids are stable across a fold") {
    import spark.implicits._
    val dir = s"${tmpDir()}/dict"
    // 6 getOrCreate batches -> 6 atomic appends, like a long-running
    // ingest assigning dictionary keys
    (0 until 6).foreach { b =>
      graft.engine.Dictionary.getOrCreate(
        Seq.tabulate(4)(i => s"val-$b-$i").toDF("v"), "v", dir, s"t$b")
    }
    val before = graft.engine.Dictionary.getOrCreate(
      Seq("val-0-0", "val-5-3").toDF("v"), "v", dir, "probe1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = Compact.run(spark, dir)
    assert(r.merges >= 1 && r.filesAfter < r.filesBefore)
    val after = graft.engine.Dictionary.getOrCreate(
      Seq("val-0-0", "val-5-3").toDF("v"), "v", dir, "probe2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, "every assigned id survives the fold unchanged")
  }

  test("randomized: any batch mix under any layout preserves rows and converges") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 4).foreach { trial =>
      val dir = s"${tmpDir()}/store"
      val sizes = Seq.fill(2 + rnd.nextInt(9))(1 + rnd.nextInt(400))
      sizes.zipWithIndex.foreach { case (n, i) =>
        Store.atomicAppend(
          spark.range(i * 1000, i * 1000 + n).select(col("id"), (col("id") % 5).as("k")),
          dir, f"b$i%03d")
      }
      val o = Compact.Options(
        l0MaxParts = 1 + rnd.nextInt(5),
        l1PartBytes = 512L << rnd.nextInt(6),
        l1MaxLevelBytes = 512L << rnd.nextInt(6),
        sizeMultiplier = 2 + rnd.nextInt(4))
      val expected = sizes.sum.toLong
      Compact.run(spark, dir, o)
      assert(Compact.read(spark, dir, o).count() == expected,
        s"trial $trial lost rows (sizes=$sizes opts=$o)")
      val again = Compact.run(spark, dir, o)
      assert(again.merges == 0 || again.passes <= o.maxPasses,
        s"trial $trial did not converge: $again")
      assert(Compact.read(spark, dir, o).count() == expected)
    }
  }

  test("streaming ingest -> L0 appends -> compaction: the full LSM lifecycle analog") {
    // The reference's write path is WAL -> memtable -> L0 parts ->
    // background compaction (storage/src/db.rs). Spark analog run end
    // to end: streamingTrack micro-batches append atomic L0 parts to
    // an events store, Compact folds them through the leveled picker,
    // and every ingested row survives with its enrichment intact.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ranges = Seq((0L, 1000L, "US")).toDF("start", "end", "country")
    val root = tmpDir()
    val store = s"$root/events"
    val input = MemoryStream[(String, Long, String, Long)]
    val q = graft.ingest.Ingest.streamingTrack(
      input.toDF().toDF("user_key", "seq", "ua", "ip"),
      s"$root/ids", ranges) { (denorm, batchId) =>
        Store.atomicAppend(
          denorm.select("user_key", "resolved_user_id", "seq", "country"),
          store, f"batch-$batchId%05d")
      }
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      (0 until 6).foreach { b =>
        input.addData((s"u$b", b.toLong, "curl/8", 7L), ("u0", 100L + b, "curl/8", 7L))
        q.processAllAvailable()
      }
    } finally q.stop()
    val r = Compact.run(spark, store)
    assert(r.filesBefore == 6 && r.merges == 1, s"6 L0 batches fold: $r")
    val got = Compact.read(spark, store)
    assert(got.count() == 12, "every ingested row survives compaction")
    assert(got.filter(col("user_key") === "u0").count() == 7)
    assert(got.select("country").distinct().collect().map(_.getString(0)).toSeq == Seq("US"),
      "enrichment rides through append + merge")
  }

  test("appends after compaction are served and adopted by the next run") {
    val dir = s"${tmpDir()}/store"
    appendBatches(dir, 6)
    Compact.run(spark, dir)
    val df = spark.range(10000, 10100).select(col("id"), (col("id") % 7).as("k"))
    Store.atomicAppend(df, dir, "batch-late")
    assert(Compact.read(spark, dir).count() == 700, "append visible without a run")
    val lv = Compact.levels(spark, dir)
    assert(lv.getOrElse(0, (0, 0L))._1 == 1, "late append sits at L0")
    Compact.run(spark, dir)
    assert(Compact.read(spark, dir).count() == 700)
  }

  test("retention keeps superseded snapshots readable; the horizon expires them") {
    val dir = s"${tmpDir()}/store"
    val retain = Compact.Options(retainGenerations = 8)
    appendBatches(dir, 6)                       // ids 0..599
    assert(Compact.run(spark, dir, retain).merges == 1)
    val v1 = Compact.snapshotVersions(spark, dir).last
    appendBatches(dir, 6)                       // same ids again: 1200 rows
    assert(Compact.run(spark, dir, retain).merges >= 1)
    val v2 = Compact.snapshotVersions(spark, dir).last
    assert(v2 > v1)
    // superseded generations read EXACTLY their committed rows
    val snap = Compact.readVersion(spark, dir, v1)
    assert(snap.count() == 600 &&
      snap.agg(sum("id")).head.getLong(0) == 599L * 600 / 2)
    assert(Compact.readVersion(spark, dir, v2).count() == 1200)
    assert(Compact.read(spark, dir).count() == 1200)
    // cascade the L1 files into L2: v1/v2's parts are now inputs of a
    // committed merge — alive ONLY because retention protects them
    Compact.run(spark, dir, retain.copy(l1MaxLevelBytes = 1))
    assert(Compact.readVersion(spark, dir, v1).count() == 600,
      "retention must protect a superseded generation's merged-away inputs")
    // and a further plain run()'s crash-leftover sweep must not
    // reclassify those retained files as stale
    Compact.run(spark, dir, retain)
    assert(Compact.readVersion(spark, dir, v1).count() == 600)
    assert(Compact.read(spark, dir).count() == 1200)
    // shrink the horizon to 1: old generations AND their exclusive
    // files expire, the latest read never regresses
    appendBatches(dir, 6)
    Compact.run(spark, dir, retain.copy(retainGenerations = 1))
    val versions = Compact.snapshotVersions(spark, dir)
    assert(!versions.contains(v1), s"v1=$v1 expired, readable: $versions")
    assert(versions.length <= 2)
    intercept[IllegalArgumentException] {
      Compact.readVersion(spark, dir, v1)
    }
    assert(Compact.read(spark, dir).count() == 1800)
  }

  test("table-level snapshots: consistent cut across leaves, pins survive compaction, drop releases") {
    val root = s"${tmpDir()}/table"
    def appendLeaf(k: String, lo: Int, n: Int): Unit =
      (0 until n).foreach { i =>
        val df = spark.range(lo + i * 100, lo + i * 100 + 100)
          .select(col("id"))
        Store.atomicAppend(df, s"$root/k=$k", f"batch-$k-${lo + i}%06d")
      }
    val o = Compact.Options(retainGenerations = 0, l0MaxParts = 2)
    appendLeaf("a", 0, 6); appendLeaf("b", 10000, 6)
    Compact.runPartitioned(spark, root, o)
    val snap = Compact.snapshotPartitioned(spark, root)
    // table grows and folds AFTER the cut — with retain=0 ONLY the
    // pin keeps the cut's generations alive
    appendLeaf("a", 1000, 6); appendLeaf("b", 20000, 6)
    Compact.runPartitioned(spark, root, o)
    val cut = Compact.readSnapshotPartitioned(spark, root, snap)
    assert(cut.count() == 1200, "the cut sees exactly the pre-append rows")
    // partition column restored from the layout
    assert(cut.filter(col("k") === "a").count() == 600)
    assert(cut.agg(sum("id")).head.getLong(0) ==
      (0L until 600).sum + (10000L until 10600).sum)
    // current read sees everything
    val now = spark.read.parquet(root)
    assert(now.count() == 2400)
    // a second capture pins the new state; ids are monotonic
    val snap2 = Compact.snapshotPartitioned(spark, root)
    assert(snap2 > snap)
    assert(Compact.partitionedSnapshots(spark, root) == Seq(snap, snap2))
    // dropping the first pin releases its generations: after more
    // folds the old cut's manifests expire and the read fails loudly
    Compact.dropSnapshotPartitioned(spark, root, snap)
    appendLeaf("a", 2000, 6); appendLeaf("b", 30000, 6)
    Compact.runPartitioned(spark, root, o)
    intercept[Exception] {
      Compact.readSnapshotPartitioned(spark, root, snap).count()
    }
    // but the still-pinned snapshot remains exact
    assert(Compact.readSnapshotPartitioned(spark, root, snap2).count() == 2400)
    assert(spark.read.parquet(root).count() == 3600)
  }

  test("manifest stats prune parts; pruned read equals filtered read") {
    val dir = s"${tmpDir()}/store"
    val o = Compact.Options(l0MaxParts = 2, l1PartBytes = 24L << 10,
      sortCols = Seq("id"), clusterByRange = true, statsCols = Seq("id", "s", "dead"))
    // 8 appends covering ids 0..7999, each spanning the FULL range
    // (worst case for skipping before compaction clusters them)
    (0 until 8).foreach { i =>
      val df = spark.range(0, 8000).filter(col("id") % 8 === i)
        .select(col("id"), concat(lit("v"), lpad(col("id").cast("string"), 6, "0")).as("s"),
          lit(null).cast("double").as("dead"))
      Store.atomicAppend(df, dir, f"batch-$i%05d")
    }
    val r = Compact.run(spark, dir, o)
    assert(r.merges >= 1)
    // range-clustered merge output + footer stats → a narrow id range
    // touches a strict subset of parts
    val preds = Seq(Compact.PartRange("id", Some(1000L), Some(1200L)))
    val rep = Compact.pruneReport(spark, dir, preds, o)
    assert(rep.skippedFiles > 0,
      s"clustered parts must let a narrow range skip files: $rep")
    assert(rep.keptFiles > 0)
    val pruned = Compact.readPruned(spark, dir, preds, o)
    assert(pruned.count() == 201)
    assert(pruned.agg(sum("id")).head.getLong(0) == (1000L to 1200L).sum)
    // string stats prune too
    val srep = Compact.pruneReport(spark, dir,
      Seq(Compact.PartRange("s", Some("v007900"), None)), o)
    assert(srep.skippedFiles > 0, s"string range must skip: $srep")
    assert(Compact.readPruned(spark, dir,
      Seq(Compact.PartRange("s", Some("v007900"), None)), o).count() == 100)
    // an all-null column prunes every value predicate
    val nrep = Compact.pruneReport(spark, dir,
      Seq(Compact.PartRange("dead", Some(0.0), None)), o)
    assert(nrep.keptFiles == 0, s"all-null column matches nothing: $nrep")
    assert(Compact.readPruned(spark, dir,
      Seq(Compact.PartRange("dead", Some(0.0), None)), o).count() == 0)
    // IN pruning: two point ids touch at most two parts' ranges
    val inRep = Compact.pruneReport(spark, dir,
      Seq(Compact.PartIn("id", Seq(5L, 7995L))), o)
    assert(inRep.skippedFiles > 0)
    assert(Compact.readPruned(spark, dir,
      Seq(Compact.PartIn("id", Seq(5L, 7995L))), o).count() == 2)
    // stats survive the manifest round trip: a fresh run backfills
    // nothing and pruning still works manifest-only
    val r2 = Compact.run(spark, dir, o)
    assert(r2.merges == 0)
    assert(Compact.pruneReport(spark, dir, preds, o).skippedFiles == rep.skippedFiles)
    // appends after the run carry no stats yet → never skipped, and
    // the residual filter still applies
    Store.atomicAppend(
      spark.range(100000, 100010).select(col("id"),
        lit("zzz").as("s"), lit(null).cast("double").as("dead")),
      dir, "late-append")
    val lateRep = Compact.pruneReport(spark, dir, preds, o)
    assert(lateRep.keptFiles == rep.keptFiles + 1, "stats-less append is always kept")
    assert(Compact.readPruned(spark, dir, preds, o).count() == 201)
  }

  test("replacing stores prune only on replace-key predicates") {
    val dir = s"${tmpDir()}/store"
    val o = Compact.Options(l0MaxParts = 1, sortCols = Seq("k"),
      clusterByRange = true, statsCols = Seq("k", "ver"),
      replaceOn = Seq("k"), versionCol = Some("ver"))
    // two generations of the same keys: newest version wins on read
    Store.atomicAppend(
      spark.range(0, 100).select(col("id").as("k"), lit(1L).as("ver")),
      dir, "gen1")
    Store.atomicAppend(
      spark.range(0, 100).select(col("id").as("k"), lit(2L).as("ver")),
      dir, "gen2")
    Compact.run(spark, dir, o)
    // append a THIRD generation so versions split across files again
    Store.atomicAppend(
      spark.range(0, 50).select(col("id").as("k"), lit(3L).as("ver")),
      dir, "gen3")
    Compact.run(spark, dir, o)
    // a ver predicate must NOT prune files: skipping the file holding
    // a key's newest row would resurrect the older version
    val got = Compact.readPruned(spark, dir,
      Seq(Compact.PartRange("ver", Some(1L), Some(2L))), o)
    // keys 0..49 are at ver 3 (fail the filter AFTER dedup); 50..99 at ver 2
    assert(got.count() == 50, "residual filter applies after replacement")
    assert(got.agg(min("ver"), max("ver")).head == org.apache.spark.sql.Row(2L, 2L))
    // key predicates DO prune
    val rep = Compact.pruneReport(spark, dir,
      Seq(Compact.partEq("k", 10L)), o)
    assert(Compact.readPruned(spark, dir,
      Seq(Compact.partEq("k", 10L)), o).count() == 1)
    assert(rep.keptFiles + rep.skippedFiles > 0)
  }

  test("partitioned pruned read: directory pruning plus per-leaf stats") {
    val root = s"${tmpDir()}/table"
    val o = Compact.Options(l0MaxParts = 2, l1PartBytes = 12L << 10,
      sortCols = Seq("uid"), clusterByRange = true, statsCols = Seq("uid"))
    (0 until 6).foreach { i =>
      val df = spark.range(0, 3000).filter(col("id") % 6 === i)
        .select(col("id").as("uid"))
      (0 to 1).foreach { d =>
        Store.atomicAppend(df.filter(col("uid") % 2 === d),
          s"$root/day=$d", f"b-$i%03d")
      }
    }
    Compact.runPartitioned(spark, root, o)
    val got = Compact.readPartitionedPruned(spark, root,
      Seq(Compact.PartRange("uid", Some(100L), Some(300L)),
        Compact.partEq("day", 0)), o)
    assert(got.count() == (100L to 300L).count(_ % 2 == 0))
    assert(got.agg(sum("uid")).head.getLong(0) ==
      (100L to 300L).filter(_ % 2 == 0).sum)
  }

  test("partitioned pruned read folds replaceOn versions and sumOn partials per leaf") {
    // replaceOn: superseded versions within a leaf must not be
    // served; each leaf folds independently (the unit of compaction
    // is the leaf, so read ≡ compact-then-read)
    val root = s"${tmpDir()}/pfold"
    val o = Compact.Options(l0MaxParts = 2, statsCols = Seq("k", "ver"),
      replaceOn = Seq("k"), versionCol = Some("ver"))
    (0 to 1).foreach { d =>
      Store.atomicAppend(
        spark.range(0, 100).select(col("id").as("k"), lit(1L + d).as("ver")),
        s"$root/day=$d", "gen")
    }
    Store.atomicAppend(
      spark.range(0, 50).select(col("id").as("k"), lit(9L).as("ver")),
      s"$root/day=0", "gen2")
    val got = Compact.readPartitionedPruned(spark, root, Nil, o)
    assert(got.count() == 200, "one served row per (leaf, key)")
    assert(got.filter(col("k") < 50 && col("day") === 0).agg(min("ver"))
      .head.getLong(0) == 9L, "within-leaf supersession folds")
    assert(got.filter(col("ver") === 1L).count() == 50,
      "day=0 keys 50..99 still serve ver 1; ver 1 for k<50 is superseded")
    // residual predicates apply AFTER the fold, same as readPruned
    assert(Compact.readPartitionedPruned(spark, root,
      Seq(Compact.PartRange("ver", Some(9L), Some(9L))), o).count() == 50)
    // read ≡ compact-then-read: physical per-leaf fold changes nothing
    Compact.runPartitioned(spark, root, o)
    assert(Compact.readPartitionedPruned(spark, root, Nil, o).count() == 200)

    // sumOn: a reader over un-compacted partials folds them (and must
    // NOT sum the directory partition column)
    val sroot = s"${tmpDir()}/psum"
    val so = Compact.Options(l0MaxParts = 10, sumOn = Seq("k"))
    (0 to 1).foreach { b =>
      Store.atomicAppend(
        spark.range(0, 10).select(col("id").as("k"), lit(5L).as("n")),
        s"$sroot/day=0", s"b$b")
    }
    val sgot = Compact.readPartitionedPruned(spark, sroot, Nil, so)
    assert(sgot.count() == 10 && sgot.agg(min("n"), max("n")).head ==
      org.apache.spark.sql.Row(10L, 10L), "partials fold on read")
    assert(sgot.select(col("day").cast("string")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("0"), "partition column intact")
  }

  test("aggregating store: merges and readers fold partials identically; replays are no-ops") {
    val dir = s"${tmpDir()}/view"
    val o = Compact.Options(l0MaxParts = 2, sumOn = Seq("k"))
    def partial(lo: Int, hi: Int) =
      spark.range(lo, hi)
        .groupBy((col("id") % 7).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
    // three ingest batches append their partial aggregates
    assert(Store.atomicAppendOnce(partial(0, 500), dir, "b0"))
    assert(Store.atomicAppendOnce(partial(500, 900), dir, "b1"))
    assert(Store.atomicAppendOnce(partial(900, 1400), dir, "b2"))
    def truth(n: Int) = spark.range(0, n)
      .groupBy((col("id") % 7).as("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got() = Compact.read(spark, dir, o)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // fold-on-read BEFORE any compaction
    assert(got() == truth(1400))
    // compaction folds physically; the read is unchanged
    val r = Compact.run(spark, dir, o)
    assert(r.merges >= 1)
    assert(Compact.read(spark, dir, o).count() == 7, "one physical row per group")
    assert(got() == truth(1400))
    // a REPLAYED batch (same deterministic name) is a no-op even
    // though compaction already consumed its file — the marker, not
    // the file, carries the idempotency
    assert(!Store.atomicAppendOnce(partial(0, 500), dir, "b0"))
    assert(got() == truth(1400))
    // more appends after compaction: mixed folded+partial state reads exact
    assert(Store.atomicAppendOnce(partial(1400, 2000), dir, "b3"))
    assert(got() == truth(2000))
    Compact.run(spark, dir, o)
    assert(got() == truth(2000))
    // key-column pruning stays sum-safe: a pruned group is absent,
    // surviving groups keep their full sums
    val o2 = o.copy(statsCols = Seq("k"))
    Compact.run(spark, dir, o2)
    val one = Compact.readPruned(spark, dir, Seq(Compact.partEq("k", 3L)), o2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == truth(2000).filter(_._1 == 3L))
  }

  test("bloom skipping: equality probes skip parts min/max cannot") {
    import spark.implicits._
    val dir = s"${tmpDir()}/bloom"
    val o = Compact.Options(l0MaxParts = 10, statsCols = Seq("u"),
      bloomCols = Seq("u"), bloomBits = 1 << 14)
    // ingest-time-ordered parts: sentinels 0 and 999 pin every part's
    // (min, max) to the full domain, so RANGE stats can never skip —
    // but each interior user lives in exactly one part
    def slice(i: Int) = ((100 * i until 100 * (i + 1)).map(_.toLong) ++ Seq(0L, 999L))
      .map(u => (u, i.toLong)).toDF("u", "t")
    (0 until 3).foreach(i => Store.atomicAppend(slice(i), dir, s"s$i"))
    Compact.run(spark, dir, o) // no merge (l0Max=10): bloom backfill only
    def report(p: Compact.PartPred*) = Compact.pruneReport(spark, dir, p.toSeq, o)
    def rows(p: Compact.PartPred*) = Compact.readPruned(spark, dir, p.toSeq, o)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // present interior user: ONLY its slice is read, result exact
    val r150 = report(Compact.partEq("u", 150L))
    assert(r150.keptFiles == 1 && r150.skippedFiles == 2, s"bloom skipped: $r150")
    assert(rows(Compact.partEq("u", 150L)) == full.filter(_._1 == 150L))
    // absent user: every part skipped, empty-but-correct result
    val rAbs = report(Compact.partEq("u", 123456L))
    assert(rAbs.keptFiles == 0 && rAbs.skippedFiles == 3, s"all skipped: $rAbs")
    assert(rows(Compact.partEq("u", 123456L)).isEmpty)
    // IN over two slices keeps exactly those two
    assert(report(Compact.PartIn("u", Seq(150L, 250L))).keptFiles == 2)
    // probes are integer-width-insensitive (Int vs Long hash alike)
    assert(report(Compact.partEq("u", 150)).keptFiles == 1)
    // a range predicate never consults the bloom
    assert(report(Compact.PartRange("u", lo = Some(130L), hi = Some(170L)))
      .keptFiles == 3)
    // an unsupported probe type keeps everything and the residual
    // filter still yields the exact result
    assert(report(Compact.partEq("u", 150.0)).keptFiles == 3)
    assert(rows(Compact.partEq("u", 150.0)) == full.filter(_._1 == 150L))
    // sentinel user present in EVERY part: nothing skips, nothing lost
    assert(report(Compact.partEq("u", 999L)).keptFiles == 3)
    assert(rows(Compact.partEq("u", 999L)) == full.filter(_._1 == 999L))
    // merge outputs carry blooms built at merge time
    val o1 = o.copy(l0MaxParts = 1)
    assert(Compact.run(spark, dir, o1).merges >= 1)
    val rm = Compact.pruneReport(spark, dir, Seq(Compact.partEq("u", 123456L)), o1)
    assert(rm.keptFiles == 0 && rm.skippedFiles >= 1,
      s"merged part bloom skips the absent user: $rm")
    assert(Compact.readPruned(spark, dir, Seq(Compact.partEq("u", 150L)), o1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      full.filter(_._1 == 150L))
  }

  test("z-order clustering: min/max pruning works on every listed dimension") {
    import spark.implicits._
    // two independent uniform dimensions over a 1000x1000 grid, with
    // an incompressible payload so the merge splits into several
    // output parts under the small part cap
    def data(lo: Long, hi: Long) = spark.range(lo, hi).select(
      (col("id") % 1000).as("u"),
      ((col("id") * 7919) % 1000).as("t"),
      md5(col("id").cast("string")).as("payload"))
    val zDir = s"${tmpDir()}/zorder"
    val sDir = s"${tmpDir()}/singlekey"
    val zo = Compact.Options(l0MaxParts = 1, l1PartBytes = 128L << 10,
      statsCols = Seq("u", "t"), zorderCols = Seq("u", "t"))
    val so = zo.copy(zorderCols = Nil, sortCols = Seq("u"), clusterByRange = true)
    Seq(zDir, sDir).foreach { d =>
      // 16 small L0 appends (each well under the part cap)
      (0 until 16).foreach(i =>
        Store.atomicAppend(data(1250L * i, 1250L * (i + 1)), d, s"a$i"))
    }
    val zRep = Compact.run(spark, zDir, zo)
    val sRep = Compact.run(spark, sDir, so)
    assert(zRep.merges >= 1 && zRep.filesAfter >= 4, s"several z parts: $zRep")
    assert(sRep.merges >= 1 && sRep.filesAfter >= 4, s"several s parts: $sRep")
    val uBand = Compact.PartRange("u", lo = Some(0L), hi = Some(99L))
    val tBand = Compact.PartRange("t", lo = Some(0L), hi = Some(99L))
    def skipped(dir: String, o: Compact.Options, p: Compact.PartPred*) =
      Compact.pruneReport(spark, dir, p.toSeq, o).skippedFiles
    // the single-key store prunes its sort key but is blind on t
    assert(skipped(sDir, so, uBand) >= 1)
    assert(skipped(sDir, so, tBand) == 0,
      "range clustering on u leaves every part spanning the full t range")
    // the z-ordered store prunes on BOTH dimensions, and the
    // conjunction at least as hard as either alone
    val (zu, zt) = (skipped(zDir, zo, uBand), skipped(zDir, zo, tBand))
    assert(zu >= 1, s"z prunes on u: $zu")
    assert(zt >= 1, s"z prunes on t: $zt")
    assert(skipped(zDir, zo, uBand, tBand) >= math.max(zu, zt))
    // layout only: every pruned read stays exactly read+filter
    def got(p: Compact.PartPred*) =
      Compact.readPruned(spark, zDir, p.toSeq, zo)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val full = spark.read.parquet(zDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got(uBand) == full.filter(r => r._1 <= 99))
    assert(got(tBand) == full.filter(r => r._2 <= 99))
    assert(got(uBand, tBand) == full.filter(r => r._1 <= 99 && r._2 <= 99))
    // row conservation across the z rewrite
    assert(full.size == 20000)
  }

  test("bloom skipping: string keys, null-heavy and zero-match parts") {
    import spark.implicits._
    val dir = s"${tmpDir()}/bloomstr"
    val o = Compact.Options(l0MaxParts = 10, bloomCols = Seq("name"))
    Store.atomicAppend(Seq(("alice", 1L), ("bob", 2L)).toDF("name", "v"), dir, "a")
    Store.atomicAppend(Seq(("carol", 3L), ("dave", 4L)).toDF("name", "v"), dir, "b")
    // an ALL-NULL part: its empty bloom must skip every probe
    Store.atomicAppend(Seq((Option.empty[String], 5L)).toDF("name", "v"), dir, "c")
    Compact.run(spark, dir, o)
    def kept(v: Any) =
      Compact.pruneReport(spark, dir, Seq(Compact.partEq("name", v)), o).keptFiles
    assert(kept("carol") == 1)
    assert(kept("mallory") == 0)
    assert(Compact.readPruned(spark, dir, Seq(Compact.partEq("name", "carol")), o)
      .collect().map(_.getLong(1)).toSeq == Seq(3L))
    // null probe: canonicalization refuses, every part kept, residual
    // filter (equality to null) yields no rows — never a wrong skip
    assert(kept(null) == 3)
  }

  test("schema evolution: mergeSchema stores grow columns without a rewrite") {
    import spark.implicits._
    val dir = s"${tmpDir()}/evolve"
    val o = Compact.Options(l0MaxParts = 10, mergeSchema = true,
      statsCols = Seq("a"), bloomCols = Seq("c"))
    Store.atomicAppend(Seq((1L, "x"), (2L, "y")).toDF("a", "b"), dir, "old")
    Store.atomicAppend(Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("a", "b", "c"),
      dir, "new")
    val exp = Set((1L, "x", None), (2L, "y", None),
      (3L, "z", Some(30L)), (4L, "w", Some(40L)))
    def got(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("a"), r.getAs[String]("b"),
        Option(r.getAs[Any]("c")).map(_.asInstanceOf[Long]))).toSet
    // union schema on read BEFORE any compaction: old rows serve null c
    assert(got(Compact.read(spark, dir, o)) == exp)
    // bloom backfill under the union schema: the pre-evolution part
    // has no c values, so a c-probe skips it outright
    Compact.run(spark, dir, o) // no merge at l0Max=10: metadata only
    val rep = Compact.pruneReport(spark, dir, Seq(Compact.partEq("c", 30L)), o)
    assert(rep.skippedFiles == 1 && rep.keptFiles == 1, s"old part skipped: $rep")
    assert(got(Compact.readPruned(spark, dir, Seq(Compact.partEq("c", 30L)), o))
      == exp.filter(_._3.contains(30L)))
    // compaction physically folds to the union schema (nulls written)
    val o1 = o.copy(l0MaxParts = 1)
    assert(Compact.run(spark, dir, o1).merges >= 1)
    assert(got(Compact.read(spark, dir, o1)) == exp)
    val merged = spark.read.parquet(dir)
    assert(merged.columns.toSet == Set("a", "b", "c"),
      s"merged parts carry the full union schema: ${merged.columns.toSeq}")
  }

  test("keyed deletes: tombstones hide rows everywhere; purge erases physically") {
    import spark.implicits._
    val dir = s"${tmpDir()}/erasure"
    val o = Compact.Options(l0MaxParts = 2, retainGenerations = 4,
      statsCols = Seq("u"), bloomCols = Seq("u"))
    (0 until 3).foreach(i => Store.atomicAppend(
      (0L until 300L).filter(_ % 3 == i).map(u => (u, s"payload$u")).toDF("u", "p"),
      dir, s"b$i"))
    Compact.run(spark, dir, o)
    val v1 = Compact.snapshotVersions(spark, dir).last
    def users(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val all = (0L until 300L).toSet
    assert(users(Compact.read(spark, dir, o)) == all)
    // logical delete is immediate on every read path
    val erased = (0L until 300L).filter(_ % 7 == 0)
    Compact.deleteKeys(spark, dir, erased.toDF("u"), "gdpr-1")
    val live = all -- erased
    assert(users(Compact.read(spark, dir, o)) == live)
    // time travel does NOT resurrect erased keys — deliberate
    assert(users(Compact.readVersion(spark, dir, v1, o)) == live)
    assert(users(Compact.readPruned(spark, dir,
      Seq(Compact.partEq("u", 7L)), o)).isEmpty)
    assert(users(Compact.readPruned(spark, dir,
      Seq(Compact.partEq("u", 8L)), o)) == Set(8L))
    // replayed tombstone write is a no-op
    Compact.deleteKeys(spark, dir, erased.toDF("u"), "gdpr-1")
    // physical purge: exact accounting, bytes gone, history collapsed
    val rep = Compact.purge(spark, dir, o)
    assert(rep.rowsBefore - rep.rowsAfter == erased.size.toLong, s"$rep")
    assert(rep.tombstonedKeys == erased.size.toLong)
    assert(users(Compact.read(spark, dir, o)) == live)
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).toSet == live,
      "the raw parquet files no longer contain erased keys")
    assert(Compact.snapshotVersions(spark, dir).size == 1, "history collapsed")
    // purged parts carry fresh blooms: an erased-user probe skips all
    val pr = Compact.pruneReport(spark, dir, Seq(Compact.partEq("u", 7L)), o)
    assert(pr.keptFiles == 0, s"purged blooms skip erased keys: $pr")
    // purge without tombstones is a counted no-op
    val rep2 = Compact.purge(spark, dir, o)
    assert(rep2.rowsBefore == rep2.rowsAfter && rep2.tombstonedKeys == 0L)
  }

  test("dropPartitionsBefore: TTL deletes whole leaves under every tenant") {
    import spark.implicits._
    val root = s"${tmpDir()}/ttl"
    (0L until 600L).map(i => (i, i % 2 + 1, f"2024-01-${(i / 2) % 6 + 10}%02d"))
      .toDF("v", "project_id", "event_date")
      .write.partitionBy("project_id", "event_date").parquet(root)
    val dropped = Compact.dropPartitionsBefore(spark, root,
      "event_date", "2024-01-12")
    // days 10 and 11 drop under BOTH tenants; nothing else is touched
    assert(dropped.map(_.split("/").last).toSet ==
      Set("event_date=2024-01-10", "event_date=2024-01-11"), dropped.toString)
    assert(dropped.size == 4)
    val left = spark.read.parquet(root)
    assert(left.select(col("event_date").cast("string")).distinct().collect()
      .map(_.getString(0)).toSet ==
      Set("2024-01-12", "2024-01-13", "2024-01-14", "2024-01-15"))
    assert(left.count() == (0L until 600L).count(i => (i / 2) % 6 + 10 >= 12))
    // idempotent: nothing below the cutoff remains
    assert(Compact.dropPartitionsBefore(spark, root,
      "event_date", "2024-01-12").isEmpty)
  }

  test("purgePartitioned: root tombstones erase every leaf, then clear") {
    import spark.implicits._
    val root = s"${tmpDir()}/perasure"
    val o = Compact.Options(l0MaxParts = 2)
    (0L until 400L).map(u => (u, s"d${u % 4}")).toDF("u", "part")
      .write.partitionBy("part").parquet(root)
    Compact.runPartitioned(spark, root, o)
    val erased = (0L until 400L).filter(_ % 11 == 0)
    Compact.deleteKeys(spark, root, erased.toDF("u"), "gdpr")
    // logical deletion shows through the partitioned read path
    def users() = Compact.readPartitionedPruned(spark, root, Nil, o)
      .select("u").collect().map(_.getLong(0)).toSet
    val live = (0L until 400L).toSet -- erased
    assert(users() == live)
    val reps = Compact.purgePartitioned(spark, root, o)
    assert(reps.size == 4 && reps.values.map(r => r.rowsBefore - r.rowsAfter).sum
      == erased.size.toLong, s"$reps")
    assert(users() == live)
    // tombstones cleared only after ALL leaves purged; raw files clean
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, ".tombstones")))
    assert(spark.read.parquet(root).select("u").collect()
      .map(_.getLong(0)).toSet == live)
  }

  test("dynamic file skipping: partInFrom prunes from a query-time key set") {
    import spark.implicits._
    val dir = s"${tmpDir()}/dynprune"
    val o = Compact.Options(l0MaxParts = 10, bloomCols = Seq("u"))
    // three user-residue buckets
    (0 until 3).foreach(i => Store.atomicAppend(
      (0L until 300L).filter(_ % 3 == i).map(u => (u, u * 2)).toDF("u", "v"),
      dir, s"b$i"))
    Compact.run(spark, dir, o)
    // the "dim side": keys all ≡ 1 (mod 3) — one bucket holds them all
    val dim = (1L until 300L by 3L).toDF("k")
    val pred = Compact.partInFrom(dim, "k", "u")
    val rep = Compact.pruneReport(spark, dir, Seq(pred), o)
    assert(rep.keptFiles == 1 && rep.skippedFiles == 2, s"bloom-pruned: $rep")
    // pruned read == semi-join on the collected keys
    val got = Compact.readPruned(spark, dir, Seq(pred), o)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1L until 300L by 3L).map(u => (u, u * 2)).toSet)
    // the cap throws instead of collecting an unbounded key set
    intercept[IllegalArgumentException] {
      Compact.partInFrom(spark.range(0, 500).toDF("k"), "k", "u", maxKeys = 100)
    }
  }

  test("footer row counts validate merges; a lying writer's output aborts") {
    import org.apache.hadoop.fs.Path
    val dir = s"${tmpDir()}/footers"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // footerRowCount agrees with a full read across multiple files
    spark.range(0, 137).repartition(3).write.parquet(dir)
    val files = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    assert(files.size == 3)
    assert(Compact.footerRowCount(fs, files) == 137L)
    // lying-writer double: output claiming fewer rows than the merge
    // read must abort before any commit (same gate Compact.run calls
    // between the tmp write and the manifest commit)
    val lying = s"${tmpDir()}/lying"
    spark.range(0, 100).write.parquet(lying)
    val lyingFiles = fs.listStatus(new Path(lying)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    val short = Compact.footerRowCount(fs, lyingFiles)
    assert(short == 100L)
    assertThrows[IllegalArgumentException](
      Compact.validateMergedCount(expected = 137L, actual = short))
  }
}
