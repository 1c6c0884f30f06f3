package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, bounded error above k, and the
  * merge invariant (union of per-part sketches re-sketched == sketch
  * of the whole — the property that makes it a 100 TB
  * count-distinct). */
class SketchesSpec extends SparkTestBase {

  private val K = 64

  test("kmv is exact below k") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("a", s"v$i")).toDF("g", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvHashes(df, Seq("g"), col("v"), K), Seq("g"), K).collect()
    assert(est.length == 1)
    assert(est.head.getAs[Long]("n_kept") == 40L)
    assert(est.head.getAs[Long]("distinct_est") == 40L)
  }

  test("kmv estimate lands near the truth above k, duplicates ignored") {
    import spark.implicits._
    val n = 5000
    // every value twice: distinct stays n
    val df = (1 to n).flatMap(i => Seq(("a", s"value-$i"), ("a", s"value-$i")))
      .toDF("g", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvHashes(df, Seq("g"), col("v"), K), Seq("g"), K)
      .collect().head.getAs[Long]("distinct_est")
    val err = math.abs(est.toDouble - n) / n
    assert(err < 0.30, s"est=$est truth=$n err=$err")
  }

  test("merging per-part sketches equals sketching the whole") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"part${i % 7}", s"value-$i")).toDF("g", "v")
    val whole = Sketches.kmvEstimate(
      Sketches.kmvHashes(df.withColumn("g", lit("all")), Seq("g"), col("v"), K),
      Seq("g"), K).collect().head
    val parts = Sketches.kmvHashes(df, Seq("g"), col("v"), K)
    val merged = Sketches.kmvEstimate(
      Sketches.kmvHashes(parts.withColumn("g", lit("all")),
        Seq("g"), col("kmv_hash"), K, preHashed = true),
      Seq("g"), K).collect().head
    assert(merged.getAs[Long]("kth_hash") == whole.getAs[Long]("kth_hash"))
    assert(merged.getAs[Long]("distinct_est") == whole.getAs[Long]("distinct_est"))
  }

  test("per-group top-k prunes map-side (WindowGroupLimit partial)") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
      .repartition(4)
    val plan = Sketches.kmvHashes(df, Seq("g"), col("v"), K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
  }
}
