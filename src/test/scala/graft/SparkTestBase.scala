package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // tests run under the bench/verify sessions' engine config
      // (AQE under cached plans — see Bench.scala) so suites pin the
      // behavior that actually ships
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** events fixture: (user, tsMs, event, device, value) with the
    * standard column names the engine expects. */
  def eventsDf(rows: Seq[(Long, Long, String, String, Double)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("user_id", "ts_ms", "event_type", "device", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withColumn("event_id", monotonically_increasing_id())
      .drop("ts_ms")
  }

  def collectMap(df: DataFrame, keyCol: String, valCol: String): Map[Any, Any] =
    df.collect().map(r => r.getAs[Any](keyCol) -> r.getAs[Any](valCol)).toMap
}
