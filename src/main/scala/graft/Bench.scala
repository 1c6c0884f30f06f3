package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line (driver contract). A warmup pass
  * touches every table first so file-cache/footer reads and codegen
  * warmup are not billed to the first query measured. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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

    // Load sentinel: one cheap canonical query timed (min of 3, after
    // a throwaway execution) at run start and again at run end.
    // Min-of-two per-query passes cannot correct a WHOLE run on a
    // loaded sandbox (both passes slow together); diverging sentinels
    // make such a run self-identifying in the artifact instead of
    // needing post-hoc adjudication.
    def sentinel(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        engine.Tables.events(spark, sfDir)
          .filter("event_type = 'view'").count()
        (System.nanoTime() - t0) / 1e9
      }
      // a dir without a readable events table must degrade the
      // sentinel (0.0), never kill the run before the contract line —
      // the same tolerance the warmup pass above has
      try {
        once() // throwaway: codegen/page-cache warm-up is not "load"
        Seq(once(), once(), once()).min
      } catch { case _: Throwable => 0.0 }
    }
    val sentinelStart = sentinel()

    // Two timed passes per query, min kept: a one-off environment
    // hiccup (page-cache eviction, background load) then cannot
    // multiply the recorded total; large pass-to-pass deviations are
    // flagged on stderr so a real regression can't hide as "noise".
    // local-iteration filter (comma-separated names); unset for the
    // driver's full run. A blank/empty value is UNSET (Set("") would
    // silently filter out every query), and an active filter stamps
    // the JSON line so a partial run can never pass as a full one.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val b = once()
      if (math.max(a, b) > 3 * math.min(a, b) && math.max(a, b) > 1.0)
        System.err.println(f"[bench] $name unstable: pass1=$a%.2fs pass2=$b%.2fs (keeping min)")
      name -> math.min(a, b)
    }
    // Full-precision per-query map goes to stderr (local records); the
    // stdout contract line must survive the driver's ~2000-char tail
    // capture, so per-query values are rounded to ms and, if the line
    // would still overflow, the map is trimmed to the slowest queries
    // (the total always covers every query).
    val sentinelEnd = sentinel()
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    System.err.println("[bench] full precision: " +
      results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}"))
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // and a comma decimal separator would corrupt the JSON.
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Direction-aware drift gate: a slower END sentinel means load
    // arrived mid-run — strict 2x. A slower START sentinel is either
    // early load or residual JVM warm-up the throwaway couldn't fully
    // absorb — tolerate 3x before declaring the run poisoned.
    val reliable =
      sentinelEnd <= 2 * sentinelStart && sentinelStart <= 3 * sentinelEnd
    if (!reliable)
      System.err.println(f"[bench] UNRELIABLE run: sentinel drifted " +
        f"$sentinelStart%.3fs -> $sentinelEnd%.3fs (loaded sandbox?)")
    val sentinelNote =
      s""","sentinel_start":${ms(sentinelStart)},"sentinel_end":${ms(sentinelEnd)}""" +
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
