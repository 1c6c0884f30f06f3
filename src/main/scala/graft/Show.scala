package graft

import org.apache.spark.sql.SparkSession

/** Dev main: run named driver queries and print their results (up to
  * 100 rows) — the local iteration loop for pinning oracle constants
  * and eyeballing new operators before wiring their SQL twin. Usage:
  *   runMain graft.Show [sfDir] [queryName ...]
  */
object Show {
  def main(args: Array[String]): Unit = {
    val (dirs, qnames) = args.partition(a => new java.io.File(a).isDirectory)
    val sfDir = dirs.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- qnames) {
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case None => println(s"[show] unknown query: $name")
        case Some(q) =>
          try q(spark, sfDir).show(100, truncate = false)
          catch { case e: Throwable =>
            println(s"[show] $name failed: $e")
          }
      }
    }
    spark.stop()
  }
}
