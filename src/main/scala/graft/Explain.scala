package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * driver queries (all of them with no names given) so shuffle
  * counts, PushedFilters, broadcast choices and WholeStageCodegen
  * spans can be reviewed. Usage:
  *   runMain graft.Explain [sfDir] [queryName ...]
  * Arguments that name a directory select the data dir (default:
  * SPARK_GRAFT_SF_DIR or sf0.001); everything else is a query name,
  * so `runMain graft.Explain q_es_count q_join_agg` works as
  * documented in BENCHMARKS.md. Note a few queries (the ingest
  * identity family) materialize snapshot metadata eagerly at plan
  * construction, so small jobs may run before those plans print.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dirs, qnames) = args.partition(a => new java.io.File(a).isDirectory)
    val sfDir = dirs.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val names = if (qnames.nonEmpty) qnames.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case None => println(s"[explain] unknown query: $name")
        case Some(q) =>
          try q(spark, sfDir).explain("formatted")
          catch { case e: Throwable =>
            println(s"[explain] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
