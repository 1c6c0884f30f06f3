package graft

import java.nio.file.{Files, Paths}

import graft.sources.Backup
import org.apache.spark.sql.functions._

/** Backup archive semantics (reference storage/src/db.rs:1348-1513):
  * byte-faithful round-trip, manifest readback, and — where this
  * build deliberately diverges from the reference's truncate-first
  * restore — a corrupt archive must leave the live target untouched. */
class BackupSpec extends SparkTestBase {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-backup-spec").toString

  private def writeStore(dir: String): Unit =
    eventsDf(Seq(
      (1L, 1000L, "view", "ios", 5.0), (2L, 2000L, "buy", "and", 50.0),
      (3L, 3000L, "view", "web", 2.0)))
      .write.mode("overwrite").partitionBy("device").parquet(dir)

  test("create -> restore round-trips a partitioned parquet store byte-faithfully") {
    val root = tmpDir()
    val store = s"$root/store"
    writeStore(store)
    val archive = s"$root/full.graftbak"
    val m = Backup.create(spark, store, archive)
    assert(m.files.nonEmpty && m.totalBytes > 0)
    assert(m.files.forall(e => !e.path.startsWith("_")), "bookkeeping files excluded")
    assert(Backup.readManifest(spark, archive).files == m.files)

    val restored = s"$root/restored"
    val m2 = Backup.restore(spark, archive, restored)
    assert(m2.files == m.files)
    val a = spark.read.parquet(store).orderBy("user_id")
      .collect().map(_.toString).toSeq
    val b = spark.read.parquet(restored).orderBy("user_id")
      .collect().map(_.toString).toSeq
    assert(a == b, "restored rows identical (partition columns included)")
  }

  test("restore replaces an existing target only after full validation") {
    val root = tmpDir()
    val store = s"$root/store"
    writeStore(store)
    val archive = s"$root/full.graftbak"
    Backup.create(spark, store, archive)

    // live target with different content
    val live = s"$root/live"
    eventsDf(Seq((9L, 9000L, "old", "x", 1.0)))
      .write.mode("overwrite").parquet(live)

    // truncated archive: restore must throw and leave `live` intact
    val bytes = Files.readAllBytes(Paths.get(archive))
    val cut = s"$root/cut.graftbak"
    Files.write(Paths.get(cut), java.util.Arrays.copyOf(bytes, bytes.length - 8))
    intercept[Exception](Backup.restore(spark, cut, live))
    assert(spark.read.parquet(live).select("event_type")
      .collect().map(_.getString(0)).toSeq == Seq("old"),
      "corrupt archive must not touch the live store")
    assert(!Files.list(Paths.get(root)).iterator().asScala()
      .exists(_.getFileName.toString.startsWith("live.restoring")),
      "failed restore cleans its temp directory")

    // a valid archive then swaps the live store
    Backup.restore(spark, archive, live)
    assert(spark.read.parquet(live).count() == 3)
  }

  test("restore target with a trailing slash still stages the temp dir as a sibling") {
    val root = tmpDir()
    val store = s"$root/store"
    writeStore(store)
    val archive = s"$root/full.graftbak"
    Backup.create(spark, store, archive)
    val live = s"$root/live"
    writeStore(live)
    // a trailing slash must not nest the staging dir INSIDE the
    // target, where the pre-swap delete would destroy it
    Backup.restore(spark, archive, s"$live/")
    assert(spark.read.parquet(live).count() == 3)
  }

  test("an empty-store archive restores without destroying the target") {
    val root = tmpDir()
    val store = s"$root/store"
    java.nio.file.Files.createDirectories(Paths.get(store))
    val archive = s"$root/empty.graftbak"
    assert(Backup.create(spark, store, archive).files.isEmpty)
    // live target that the (valid, empty) archive legitimately replaces
    val live = s"$root/live"
    writeStore(live)
    val m = Backup.restore(spark, archive, live)
    assert(m.files.isEmpty)
    assert(Files.exists(Paths.get(live)) &&
      !Files.list(Paths.get(live)).iterator().hasNext,
      "target swapped to the empty store, not deleted and lost")
  }

  test("a manifest entry that escapes the restore dir is rejected before any write") {
    // craft an archive whose manifest points outside the target —
    // same stream layout Backup.create writes, hostile path
    val root = tmpDir()
    val evil = s"$root/evil.graftbak"
    val victim = Paths.get(s"$root/victim.txt")
    val out = new java.io.DataOutputStream(
      new java.util.zip.DeflaterOutputStream(
        java.nio.file.Files.newOutputStream(Paths.get(evil))))
    val payload = "owned".getBytes("UTF-8")
    out.write("GRFTBAK1".getBytes("UTF-8"))
    out.writeLong(1L)
    val manifest =
      s"""{"version":1,"files":[{"path":"../victim.txt","size":${payload.length}}]}"""
        .getBytes("UTF-8")
    out.writeInt(manifest.length)
    out.write(manifest)
    out.write(payload)
    out.write("GRFTEND1".getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException](
      Backup.restore(spark, evil, s"$root/target/store"))
    assert(e.getMessage.contains("escapes"))
    assert(!Files.exists(victim), "nothing written outside the restore dir")
  }

  test("a compacted store round-trips WITH its manifest — merged data survives restore") {
    import graft.sources.{Compact, Store}
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    val store = s"$root/store"
    (0 until 6).foreach { i =>
      Store.atomicAppend(
        spark.range(i * 10, i * 10 + 10).toDF("id"), store, f"b$i%03d")
    }
    Compact.run(spark, store)
    val archive = s"$root/c.graftbak"
    val m = Backup.create(spark, store, archive)
    assert(m.files.exists(_.path.startsWith("_graft_parts-")),
      "the compaction manifest is part of the store's state")
    val restored = s"$root/restored"
    Backup.restore(spark, archive, restored)
    assert(Compact.read(spark, restored).count() == 60,
      "merged parts restore as COMMITTED data, not crash orphans")
    Compact.run(spark, restored) // must not sweep the restored merge output
    assert(Compact.read(spark, restored).count() == 60)
  }

  test("scheme-qualified manifest entries are rejected like ../ escapes") {
    val root = tmpDir()
    val evil = s"$root/evil.graftbak"
    val out = new java.io.DataOutputStream(
      new java.util.zip.DeflaterOutputStream(
        java.nio.file.Files.newOutputStream(Paths.get(evil))))
    out.write("GRFTBAK1".getBytes("UTF-8"))
    out.writeLong(1L)
    val manifest =
      s"""{"version":1,"files":[{"path":"file:$root/victim.txt","size":5}]}"""
        .getBytes("UTF-8")
    out.writeInt(manifest.length)
    out.write(manifest)
    out.write("owned".getBytes("UTF-8"))
    out.write("GRFTEND1".getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException](
      Backup.restore(spark, evil, s"$root/target"))
    assert(e.getMessage.contains("escapes"))
    assert(!Files.exists(Paths.get(s"$root/victim.txt")))
  }

  test("incremental chain: deltas apply, deletions disappear, erasure survives") {
    import spark.implicits._
    import graft.sources.{Compact, Store}
    val root = tmpDir()
    val store = s"$root/store"
    val o = Compact.Options(l0MaxParts = 2)
    (0 until 3).foreach(i => Store.atomicAppend(
      (0L until 300L).filter(_ % 3 == i).map(u => (u, u * 3)).toDF("u", "v"),
      store, s"b$i"))
    Compact.run(spark, store, o)
    val full = s"$root/full.bak"
    Backup.create(spark, store, full)
    // inc1: a pure append — the delta carries ONLY the new batch,
    // base parts ride the base archive
    Store.atomicAppend((300L until 400L).map(u => (u, u * 3)).toDF("u", "v"),
      store, "b3")
    val inc1 = s"$root/inc1.bak"
    val m1 = Backup.createIncremental(spark, store, full, inc1)
    assert(m1.isIncremental && m1.files.nonEmpty)
    assert(m1.files.size < m1.state.size, "delta carries only new files")
    // inc2: erase a cohort (purge rewrites parts and DELETES base
    // files), append again, and leave one tombstone PENDING
    Compact.deleteKeys(spark, store,
      (0L until 400L).filter(_ % 7 == 0).toDF("u"), "gdpr")
    Compact.purge(spark, store, o)
    Store.atomicAppend((400L until 450L).map(u => (u, u * 3)).toDF("u", "v"),
      store, "b4")
    Compact.deleteKeys(spark, store, Seq(401L).toDF("u"), "gdpr2")
    val inc2 = s"$root/inc2.bak"
    val m2 = Backup.createIncremental(spark, store, inc1, inc2)
    assert(m2.isIncremental)
    assert(m2.state.exists(_.path.startsWith(".tombstones/")),
      "the pending tombstone is part of the recorded state")
    // plain restore refuses an incremental archive outright
    intercept[IllegalArgumentException] {
      Backup.restore(spark, inc1, s"$root/nope")
    }
    // the chain reproduces the CURRENT store exactly
    val restored = s"$root/restored"
    Backup.restoreChain(spark, Seq(full, inc1, inc2), restored)
    def read(d: String) = Compact.read(spark, d, o).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(read(restored) == read(store))
    // (b4 reinserts some ≡0 (mod 7) ids ABOVE 400 after the purge
    // cleared the tombstones — legal; the erased range is < 400)
    assert(!read(restored).exists(t => t._1 < 400 && t._1 % 7 == 0),
      "purged keys stay gone")
    assert(!read(restored).exists(_._1 == 401L),
      "the pending tombstone still hides its key after restore")
    // a chain not anchored by a full archive is rejected
    intercept[IllegalArgumentException] {
      Backup.restoreChain(spark, Seq(inc1, full), s"$root/nope2")
    }
  }

  test("garbage bytes are rejected at the header") {
    val root = tmpDir()
    val junk = s"$root/junk.graftbak"
    Files.write(Paths.get(junk), Array.fill[Byte](64)(42))
    intercept[Exception](Backup.restore(spark, junk, s"$root/out"))
    assert(!Files.exists(Paths.get(s"$root/out")))
  }

  test("Backups registry tracks inProgress -> completed/failed") {
    val reg = new graft.model.Backups
    val b = reg.start("local", "/tmp/x.graftbak", 100L)
    assert(b.status == "inProgress" && reg.list().size == 1)
    val done = reg.complete(b.id, files = 4, bytes = 1234L, now = 200L)
    assert(done.status == "completed" && done.files == 4 && done.bytes == 1234L)
    val f = reg.fail(reg.start("local", "/tmp/y.graftbak", 300L).id, "disk full", 400L)
    assert(f.status == "failed" && f.error.contains("disk full"))
    assert(reg.get(b.id).exists(_.status == "completed"))
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
