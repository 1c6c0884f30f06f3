package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line (driver contract). A warmup pass
  * touches every table first so file-cache/footer reads and codegen
  * warmup are not billed to the first query measured.
  *
  * Environment-load defense: a cheap canonical sentinel query is timed
  * between every WINDOW of ~10 benchmarked queries (not just at the
  * run's endpoints — an endpoint-only gate reads a load hump that
  * opens AND closes mid-run as "warm-up" and certifies a poisoned run
  * reliable). The artifact carries the full `sentinels` array plus a
  * per-window `win_ok` bitmap, so any loaded window is
  * machine-identifiable from the JSON line alone: window i covers
  * queries [i*win_size, (i+1)*win_size) of the alphabetically sorted
  * query list and is bracketed by sentinels[i] / sentinels[i+1].
  * Windows whose bracketing sentinels drift >2x above the run's best
  * sentinel are re-run once after the main pass (keeping per-query
  * min), so a transient load spike costs a retry, not a round of
  * phantom regressions. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Keep AQE from serializing tiny-bytes/heavy-CPU stages (LSH
      // candidate verification): see Dedup.verifiedPairs scaladoc.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      try engine.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => }
    try engine.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }

    /** One cheap canonical query, min of `passes` timed executions.
      * A dir without a readable events table must degrade the sentinel
      * (0.0), never kill the run before the contract line — the same
      * tolerance the warmup pass above has. */
    def sentinel(passes: Int, warm: Boolean): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        engine.Tables.events(spark, sfDir)
          .filter("event_type = 'view'").count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        if (!warm) once() // throwaway: codegen/page-cache warm-up is not "load"
        Seq.fill(passes)(once()).min
      } catch { case _: Throwable => 0.0 }
    }

    // Two timed passes per query, min kept: a one-off environment
    // hiccup (page-cache eviction, background load) then cannot
    // multiply the recorded total; large pass-to-pass deviations are
    // flagged on stderr so a real regression can't hide as "noise".
    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val b = once()
      if (math.max(a, b) > 3 * math.min(a, b) && math.max(a, b) > 1.0)
        System.err.println(f"[bench] $name unstable: pass1=$a%.2fs pass2=$b%.2fs (keeping min)")
      math.min(a, b)
    }

    // local-iteration filter (comma-separated names); unset for the
    // driver's full run. A blank/empty value is UNSET (Set("") would
    // silently filter out every query), and an active filter stamps
    // the JSON line so a partial run can never pass as a full one.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val winSize = 10
    val windows = selected.grouped(winSize).toSeq
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    sentinels += sentinel(passes = 3, warm = false)
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (g <- windows) {
      for ((name, fn) <- g) timings(name) = time(name, fn)
      // Release dead localCheckpoint blocks between windows (the
      // ContextCleaner only reclaims after a GC notices them) so
      // storage-memory pressure from earlier queries is never billed
      // to later ones. Outside every timed section.
      System.gc()
      sentinels += sentinel(passes = 2, warm = true)
    }

    // A window is clean when both bracketing sentinels sit within 2x
    // of the run's best sentinel (plus a 150 ms absolute floor so a
    // sub-100ms best doesn't turn scheduler jitter into "load").
    val liveSents = sentinels.filter(_ > 0)
    def gate(best: Double): Double = math.max(2 * best, best + 0.15)
    def winOk(i: Int, best: Double): Boolean =
      best == 0.0 ||
        math.max(sentinels(i), sentinels(i + 1)) <= gate(best)
    var best = if (liveSents.nonEmpty) liveSents.min else 0.0
    val firstPassOk = windows.indices.map(winOk(_, best))

    // Retry pass: re-time every query inside a drifted window (keeping
    // min with the original — min across passes is monotone toward the
    // true idle cost), bracketed by fresh sentinels appended to the
    // array so the retry block's own cleanliness is also on record.
    val retried = scala.collection.mutable.ArrayBuffer[String]()
    if (firstPassOk.exists(!_) && best > 0.0) {
      val badWindows = windows.indices.filter(i => !firstPassOk(i))
      System.err.println(s"[bench] sentinel drift in windows ${badWindows.mkString(",")}; retrying their queries")
      sentinels += sentinel(passes = 2, warm = true)
      for (i <- badWindows; (name, fn) <- windows(i)) {
        timings(name) = math.min(timings(name), time(name, fn))
        retried += name
      }
      sentinels += sentinel(passes = 2, warm = true)
      best = math.min(best, sentinels.takeRight(2).filter(_ > 0).foldLeft(best)(math.min))
    }
    // Final per-window verdict: a retried window is judged by the
    // retry block's bracketing sentinels (the last two), not the
    // original loaded ones.
    val retryOk =
      if (retried.nonEmpty)
        best == 0.0 || sentinels.takeRight(2).max <= gate(best)
      else true
    val windowOk = windows.indices.map { i =>
      if (firstPassOk(i)) winOk(i, best) else retryOk
    }
    val reliable = windowOk.forall(identity)
    if (!reliable)
      System.err.println(s"[bench] UNRELIABLE run: loaded windows ${windowOk.zipWithIndex.collect { case (false, i) => i }.mkString(",")} (sentinels: ${sentinels.mkString(",")})")

    val results = timings.toSeq.sortBy(_._1)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full-precision per-query map goes to stderr (local records); the
    // stdout contract line must survive the driver's ~2000-char tail
    // capture, so per-query values are rounded to ms and, if the line
    // would still overflow, the map is trimmed to the slowest queries
    // (the total always covers every query).
    System.err.println("[bench] full precision: " +
      results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}"))
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // and a comma decimal separator would corrupt the JSON.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val sentinelNote =
      s""","sentinels":[${sentinels.map(ms).mkString(",")}]""" +
        s""","win_size":$winSize""" +
        s""","win_ok":[${windowOk.map(b => if (b) 1 else 0).mkString(",")}]""" +
        s""","retried":${retried.size}""" +
        s""","reliable":$reliable""" +
        (if (only.isDefined) s""","only":true""" else "")
    def line(rs: Seq[(String, Double)], note: String): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + ms(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs$note$sentinelNote,"sf":"$sfDir"}"""
    }
    val full = line(results, "")
    val out =
      if (full.length <= 1600) full
      else {
        val bySlowest = results.sortBy(-_._2)
        // largest slowest-N prefix whose line stays under the budget
        val fitted = Iterator.range(bySlowest.size, 0, -1).map { n =>
          val kept = bySlowest.take(n).sortBy(_._1)
          line(kept, s""","queries_shown":$n,"queries_total":${results.size}""")
        }.find(_.length <= 1600)
        fitted.getOrElse(line(Seq.empty,
          s""","queries_shown":0,"queries_total":${results.size}"""))
      }
    // stop() BEFORE printing: the contract line is the process's very
    // last output, so no shutdown log line can push it out of the
    // driver's bounded tail capture.
    spark.stop()
    println(out)
  }
}
