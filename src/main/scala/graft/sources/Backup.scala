package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, DeflaterOutputStream, InflaterInputStream}

import graft.model.Json
import graft.model.Json._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Full backup/restore of a parquet store directory — the analog of
  * the reference's single-stream archive (reference
  * storage/src/db.rs:1348-1513 `full_backup`/`full_restore`: version,
  * serialized table metadata, log + part bytes, magic footer, zlib
  * for the local provider; platform/src/http/backups.rs routes it).
  *
  * On Spark the LSM's logs/levels collapse to immutable parquet
  * files, so the archive is: MAGIC, format version, a JSON manifest
  * (relative path + size per file), each file's raw bytes in manifest
  * order, and a trailing MAGIC — the same
  * validate-everything-before-trusting shape as the reference's
  * BACKUP_MAGIC check. The whole stream rides a Deflater, mirroring
  * `full_backup_local`'s ZlibEncoder.
  *
  * All IO goes through the Hadoop FileSystem API, so file://, hdfs://
  * and s3a:// stores archive identically. Restore is SAFER than the
  * reference's truncate-first: the archive unpacks into a temp
  * directory, the footer and every per-file size are validated there,
  * and only then does a delete + rename swap the target — a torn or
  * corrupt archive can never destroy the live store (db.rs:1452
  * truncates before reading byte one; its `todo` comment concedes the
  * race). Driver-side streaming is deliberate and matches the
  * reference's single-node backup path; a 100 TB data plane would
  * snapshot parquet with a parallel copy (distcp-style) instead and
  * use this archive for the driver-adjacent store (dictionaries,
  * identity snapshots, metadata) where single-stream integrity wins.
  */
object Backup {

  private val Magic = "GRFTBAK1".getBytes(StandardCharsets.UTF_8)
  private val EndMagic = "GRFTEND1".getBytes(StandardCharsets.UTF_8)
  private val Version = 1L

  final case class Entry(path: String, size: Long)
  /** `files` = what this archive physically carries; `state` (only in
    * INCREMENTAL archives) = the complete store listing at backup
    * time, so a chain restore knows exactly which files the final
    * store must contain — including which base files were deleted by
    * compaction or purge in between. */
  final case class Manifest(version: Long, files: Seq[Entry],
                            state: Seq[Entry] = Nil) {
    def totalBytes: Long = files.map(_.size).sum
    def isIncremental: Boolean = state.nonEmpty
    def effectiveState: Seq[Entry] = if (state.nonEmpty) state else files
  }

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hidden/underscore names are writer bookkeeping (_SUCCESS, .crc)
    * EXCEPT the two that carry store state a restore must preserve:
    * Compact's versioned part manifests (without them every merged-L*
    * file restores as an uncommitted-crash orphan and is swept — the
    * compacted history silently vanishes) and StreamingDedup's batch
    * replay markers (without them a replayed batch re-appends its
    * signatures). */
  private def keep(name: String): Boolean =
    name.startsWith("_graft_parts-") ||
      (name.startsWith(".batch-") && name.endsWith(".done")) ||
      // pending tombstones and the quarantine dead-letter ARE store
      // state: a restore that dropped .tombstones would RESURRECT
      // erased keys (the one direction an erasure must never fail),
      // and quarantined rows are data awaiting triage
      name == ".tombstones" || name == ".quarantine" ||
      name.startsWith("_graft_snapshot-") ||
      (!name.startsWith(".") && !name.startsWith("_"))

  /** Data + state files under `dir`, recursively, as store-relative
    * paths in deterministic order. Paths are qualified before the
    * prefix strip — a relative `dir` against the FS's qualified
    * listing would otherwise leave absolute prefixes in the entries
    * and restore into a wrongly nested tree. */
  private def listFiles(fs: FileSystem, dir: Path): Seq[Entry] = {
    val base = fs.makeQualified(dir).toUri.getPath
    def walk(p: Path): Seq[Entry] =
      fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory) { if (keep(name)) walk(st.getPath) else Nil }
        else if (!keep(name)) Nil
        else Seq(Entry(fs.makeQualified(st.getPath).toUri.getPath
          .stripPrefix(base).stripPrefix("/"), st.getLen))
      }
    walk(dir)
  }

  private def entriesJson(es: Seq[Entry]): String =
    es.map(e =>
      s"""{"path":${JStr(e.path).render},"size":${e.size}}""").mkString("[", ",", "]")

  private def manifestJson(m: Manifest): String = {
    val stateField =
      if (m.state.isEmpty) "" else s""","state":${entriesJson(m.state)}"""
    s"""{"version":${m.version},"files":${entriesJson(m.files)}$stateField}"""
  }

  private def parseManifest(s: String): Manifest = {
    val j = Json.parse(s)
    def entries(v: Json.JValue) =
      v.arr.map(f => Entry((f / "path").str, (f / "size").long))
    Manifest((j / "version").long, entries(j / "files"),
      j.asOpt("state").map(entries).getOrElse(Nil))
  }

  /** Archive the store at `storeDir` into `archiveFile` (overwrites).
    * Returns the manifest that was written. */
  def create(spark: SparkSession, storeDir: String, archiveFile: String): Manifest = {
    val src = new Path(storeDir)
    val srcFs = fsFor(spark, src)
    require(srcFs.exists(src), s"store directory $storeDir does not exist")
    writeArchive(spark, srcFs, src, Manifest(Version, listFiles(srcFs, src)),
      archiveFile)
  }

  /** Incremental backup against a prior archive (full or itself
    * incremental): only files ABSENT from the base's effective state
    * enter the archive — parquet parts are immutable, so path
    * identity is change identity, and a same-path-different-size file
    * is corruption and aborts. The delta manifest also records the
    * COMPLETE current listing, so [[restoreChain]] reproduces exactly
    * this state, including base files that compaction or purge
    * deleted in between. */
  def createIncremental(spark: SparkSession, storeDir: String,
                        baseArchive: String, archiveFile: String): Manifest = {
    val src = new Path(storeDir)
    val srcFs = fsFor(spark, src)
    require(srcFs.exists(src), s"store directory $storeDir does not exist")
    val base = readManifest(spark, baseArchive).effectiveState
      .map(e => e.path -> e.size).toMap
    val current = listFiles(srcFs, src)
    current.foreach(e => base.get(e.path).foreach(sz => require(sz == e.size,
      s"${e.path} changed size since the base archive ($sz -> ${e.size}); " +
        "store files are immutable — refusing an inconsistent delta")))
    val delta = current.filterNot(e => base.contains(e.path))
    writeArchive(spark, srcFs, src, Manifest(Version, delta, state = current),
      archiveFile)
  }

  private def writeArchive(spark: SparkSession, srcFs: FileSystem, src: Path,
                           manifest: Manifest, archiveFile: String): Manifest = {
    val dstPath = new Path(archiveFile)
    val dstFs = fsFor(spark, dstPath)
    val out = new DataOutputStream(new DeflaterOutputStream(
      dstFs.create(dstPath, true), new Deflater(Deflater.DEFAULT_COMPRESSION), 1 << 16))
    try {
      out.write(Magic)
      out.writeLong(manifest.version)
      val mBytes = manifestJson(manifest).getBytes(StandardCharsets.UTF_8)
      // enforce the reader's bound at WRITE time: an archive that
      // restore would reject must fail the backup, not the restore
      require(mBytes.length <= ManifestMaxBytes,
        s"store has too many files for one archive (manifest ${mBytes.length} bytes); " +
          "archive partitions separately")
      out.writeInt(mBytes.length)
      out.write(mBytes)
      val buf = new Array[Byte](1 << 16)
      manifest.files.foreach { e =>
        val in = srcFs.open(new Path(src, e.path))
        try {
          var copied = 0L
          var n = in.read(buf)
          while (n >= 0) {
            out.write(buf, 0, n); copied += n; n = in.read(buf)
          }
          require(copied == e.size,
            s"${e.path} changed size during backup ($copied != ${e.size})")
        } finally in.close()
      }
      out.write(EndMagic)
    } finally out.close()
    manifest
  }

  /** Shared header parse: magic, version, bounded manifest length,
    * manifest JSON. One copy so the validation can never drift
    * between readManifest and restore. */
  private def readHeader(in: DataInputStream): Manifest = {
    val magic = new Array[Byte](Magic.length)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic), "not a graft backup archive")
    val version = in.readLong()
    require(version == Version, s"unsupported backup version $version")
    val mLen = in.readInt()
    if (mLen < 0 || mLen > ManifestMaxBytes) throw new IllegalArgumentException(
      s"not a graft backup archive (manifest length $mLen)")
    val mBytes = new Array[Byte](mLen)
    in.readFully(mBytes)
    parseManifest(new String(mBytes, StandardCharsets.UTF_8))
  }

  private val ManifestMaxBytes = 64 << 20

  /** Read back just the manifest (cheap — stops after the header). */
  def readManifest(spark: SparkSession, archiveFile: String): Manifest = {
    val p = new Path(archiveFile)
    val in = new DataInputStream(new InflaterInputStream(fsFor(spark, p).open(p)))
    try readHeader(in) finally in.close()
  }

  /** Restore `archiveFile` over `targetDir`: unpack into a temp
    * sibling, validate sizes and the trailing magic THERE, then swap
    * (delete target, rename temp). The live store is untouched until
    * the archive has fully proven itself. */
  def restore(spark: SparkSession, archiveFile: String, targetDir: String): Manifest = {
    val target = new Path(targetDir)
    val fs = fsFor(spark, target)
    // sibling of the NORMALIZED target — raw string concat would nest
    // tmp INSIDE a trailing-slash targetDir, and the pre-swap delete
    // would then destroy the validated restore data with the target
    val tmpName = s"${target.getName}.restoring-${System.nanoTime()}"
    val tmp = Option(target.getParent)
      .map(p => new Path(p, tmpName)).getOrElse(new Path(tmpName))
    val manifest =
      try {
        val m = unpackArchive(spark, fs, archiveFile, tmp)
        require(!m.isIncremental,
          s"$archiveFile is an INCREMENTAL archive — restore it with " +
            "restoreChain(base +: deltas) so deletions and prior files apply")
        m
      } catch { case t: Throwable => fs.delete(tmp, true); throw t }
    swapInto(fs, tmp, target)
    manifest
  }

  /** Restore a FULL archive plus its incremental chain, in order: each
    * archive unpacks over the previous state, then the tree is pruned
    * to EXACTLY the last archive's recorded state (files compaction or
    * purge deleted between backups disappear again) and every state
    * entry's size is validated before the same aside-swap as
    * [[restore]]. */
  def restoreChain(spark: SparkSession, archives: Seq[String],
                   targetDir: String): Manifest = {
    require(archives.nonEmpty, "restoreChain needs at least one archive")
    val target = new Path(targetDir)
    val fs = fsFor(spark, target)
    val tmpName = s"${target.getName}.restoring-${System.nanoTime()}"
    val tmp = Option(target.getParent)
      .map(p => new Path(p, tmpName)).getOrElse(new Path(tmpName))
    val last =
      try {
        val ms = archives.map(a => unpackArchive(spark, fs, a, tmp))
        require(!ms.head.isIncremental,
          s"${archives.head} must be a FULL archive to anchor the chain")
        val want = ms.last.effectiveState
        val wanted = want.map(e => e.path -> e.size).toMap
        // prune: anything unpacked along the way that the final state
        // no longer names was deleted between backups
        def walk(p: Path): Seq[Path] =
          fs.listStatus(p).toSeq.flatMap(st =>
            if (st.isDirectory) walk(st.getPath) else Seq(st.getPath))
        val base = fs.makeQualified(tmp).toUri.getPath
        walk(tmp).foreach { f =>
          val rel = fs.makeQualified(f).toUri.getPath
            .stripPrefix(base).stripPrefix("/")
          if (!wanted.contains(rel)) fs.delete(f, false): Unit
        }
        // every file of the final state must be present at its size
        want.foreach { e =>
          val f = new Path(tmp, e.path)
          require(fs.exists(f) && fs.getFileStatus(f).getLen == e.size,
            s"chain is missing or mis-sized ${e.path} — archives out of " +
              "order or from a different store lineage")
        }
        ms.last
      } catch { case t: Throwable => fs.delete(tmp, true); throw t }
    swapInto(fs, tmp, target)
    last
  }

  /** Unpack one archive into `tmp` (overwriting same-path files from
    * earlier archives), validating paths, sizes and the trailing
    * magic. No cleanup on failure — the caller owns `tmp`. */
  private def unpackArchive(spark: SparkSession, fs: FileSystem,
                            archiveFile: String, tmp: Path): Manifest = {
    val p = new Path(archiveFile)
    val in = new DataInputStream(new InflaterInputStream(fsFor(spark, p).open(p)))
    val manifest =
      try {
        val m = readHeader(in)
        // manifest paths are UNTRUSTED archive content: an absolute,
        // "..", or scheme-qualified entry ("file:/etc/…" — Hadoop
        // resolves a child URI carrying a scheme as ABSOLUTE) would
        // write outside the temp dir and survive both the failure
        // cleanup and the swap
        m.files.foreach { e =>
          val scheme =
            try Option(new java.net.URI(e.path).getScheme)
            catch { case _: java.net.URISyntaxException => Some("unparseable") }
          val bad = e.path.isEmpty || e.path.startsWith("/") ||
            e.path.contains("\\") || scheme.isDefined ||
            e.path.split("/").contains("..")
          if (bad) throw new IllegalArgumentException(
            s"backup manifest entry escapes the restore dir: ${e.path}")
        }
        // an empty-store archive restores to an empty dir: the swap's
        // rename needs tmp to exist even when no file write creates it
        fs.mkdirs(tmp)
        val buf = new Array[Byte](1 << 16)
        m.files.foreach { e =>
          val out = fs.create(new Path(tmp, e.path), true)
          try {
            var remaining = e.size
            while (remaining > 0) {
              val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
              if (n < 0) throw new EOFException(
                s"archive truncated inside ${e.path} ($remaining bytes short)")
              out.write(buf, 0, n); remaining -= n
            }
          } finally out.close()
        }
        val end = new Array[Byte](EndMagic.length)
        in.readFully(end)
        if (!java.util.Arrays.equals(end, EndMagic))
          throw new IllegalStateException(
            "backup archive failed footer validation (corrupt or truncated)")
        m
      } finally in.close()
    manifest
  }

  /** Validated-tmp swap. The live store is renamed ASIDE, never
    * deleted first — a crash or rename failure (cross-filesystem tmp,
    * quota) after a delete would leave NO live store. The aside copy
    * is removed only after the new store is in place; a failed swap
    * rolls the aside back and surfaces the validated tmp path so
    * recovery is a single rename, not a re-restore. */
  private def swapInto(fs: FileSystem, tmp: Path, target: Path): Unit = {
    Option(target.getParent).foreach(fs.mkdirs)
    val hadOld = fs.exists(target)
    val aside = new Path(target.toString + ".replaced-" + System.currentTimeMillis())
    if (hadOld && !fs.rename(target, aside))
      throw new IllegalStateException(
        s"could not move current store aside to $aside; " +
          s"validated restore preserved at $tmp")
    if (!fs.rename(tmp, target)) {
      if (hadOld) fs.rename(aside, target): Unit // roll the live store back
      throw new IllegalStateException(
        s"could not move restored store into $target; " +
          s"validated restore preserved at $tmp")
    }
    if (hadOld) fs.delete(aside, true): Unit
  }
}
