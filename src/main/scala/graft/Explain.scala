package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * driver queries (all of them with no args) so shuffle counts,
  * PushedFilters, broadcast choices and WholeStageCodegen spans can
  * be reviewed without running the data. Usage:
  *   runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
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
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
