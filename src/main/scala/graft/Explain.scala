package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: prints the formatted physical plan of the
  * given queries (default: a scan-heavy, a join, a two-level agg and
  * the funnel) so scan pruning / pushdown / shuffle structure can be
  * eyeballed. Not part of the driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_es_count", "q_join_agg", "q_es_count_per_group", "q_records_search")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
