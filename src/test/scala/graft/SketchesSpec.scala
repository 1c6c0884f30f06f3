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

  test("histogram quantiles: merge-additive, estimate within one bucket of truth, edges clamp") {
    import spark.implicits._
    val (lo, hi, n) = (0L, 1000L, 20) // width 50
    val vals = ((1 to 900).map(_.toLong) ++ Seq(-50L, 5000L)) // outliers clamp
    val df = vals.map(("a", _)).toDF("g", "v")
    val hist = Sketches.histogram(df, Seq("g"), col("v"), lo, hi, n)
    // buckets total everything incl. clamped edges
    assert(hist.agg(sum("cnt")).collect().head.getLong(0) == vals.length)
    assert(hist.agg(max("bucket")).collect().head.getLong(0) == n - 1L)
    // merging per-part histograms = histogram of the whole (count addition)
    val parts = Sketches.histogram(
      vals.zipWithIndex.map { case (v, i) => (s"p${i % 4}", v) }.toDF("g", "v"),
      Seq("g"), col("v"), lo, hi, n)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val whole = hist.select("bucket", "cnt")
    assert(parts.except(whole).isEmpty && whole.except(parts).isEmpty,
      "sum of per-part bucket counts == whole-set histogram")
    // p50 of 1..900 is 450; estimate must land within one bucket width
    val est = Sketches.histQuantile(hist, Seq("g"), lo, hi, n, 0.5)
      .collect().head.getAs[Long]("est")
    assert(math.abs(est - 450L) <= 50L, s"p50 est=$est")
    val est9 = Sketches.histQuantile(hist, Seq("g"), lo, hi, n, 0.9)
      .collect().head.getAs[Long]("est")
    assert(math.abs(est9 - 810L) <= 50L, s"p90 est=$est9")
  }

  test("kmvOverlap: exact below k, bounded error above k, zero-overlap row survives") {
    import spark.implicits._
    def sketch(vals: Seq[String], grp: String) = Sketches.kmvHashes(
      vals.map((grp, _)).toDF("g", "v"), Seq("g"), col("v"), K)
    // small disjoint + overlapping sets: everything below k -> exact
    val a1 = (1 to 20).map(i => s"x$i"); val b1 = (11 to 35).map(i => s"x$i")
    val small = Sketches.kmvOverlap(sketch(a1, "s"), sketch(b1, "s"), Seq("g"), K)
      .collect().head
    assert(small.getAs[Long]("est_union") == 35L)
    assert(small.getAs[Long]("n_inter_sample") == 10L)
    assert(small.getAs[Long]("est_intersection") == 10L, s"exact below k: $small")
    // large sets: |A|=2000, |B|=2000, overlap 1000 -> union 3000
    val a2 = (1 to 2000).map(i => s"big$i"); val b2 = (1001 to 3000).map(i => s"big$i")
    val big = Sketches.kmvOverlap(sketch(a2, "b"), sketch(b2, "b"), Seq("g"), K)
      .collect().head
    val eu = big.getAs[Long]("est_union").toDouble
    val ei = big.getAs[Long]("est_intersection").toDouble
    assert(math.abs(eu - 3000) / 3000 < 0.35, s"union est off: $big")
    assert(ei > 0 && math.abs(ei - 1000) / 1000 < 0.75, s"intersection est off: $big")
    // disjoint sets: the zero-overlap group must still emit a row
    val none = Sketches.kmvOverlap(
      sketch((1 to 500).map(i => s"l$i"), "z"),
      sketch((1 to 500).map(i => s"r$i"), "z"), Seq("g"), K).collect().head
    assert(none.getAs[Long]("n_inter_sample") == 0L &&
      none.getAs[Long]("est_intersection") == 0L, s"disjoint: $none")
  }

  test("streaming KMV: running estimates equal prefix sketches, replay is estimate-neutral") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-skmv").toString
    val input = MemoryStream[(String, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = Sketches.streamingKmv(input.toDF().toDF("g", "v"),
        s"$dir/sk", Seq("g"), col("v"), K) { (est, bid) =>
      got ++= est.collect().map(r =>
        (bid, r.getAs[String]("g"), r.getAs[Long]("distinct_est")))
    }.option("checkpointLocation", s"$dir/ckpt").start()
    def prefixEst(vals: Seq[String]): Long = Sketches.kmvEstimate(
      Sketches.kmvHashes(vals.map(("a", _)).toDF("g", "v"), Seq("g"), col("v"), K),
      Seq("g"), K).collect().head.getAs[Long]("distinct_est")
    try {
      val b0 = (1 to 50).map(i => ("a", s"v$i"))
      val b1 = (30 to 120).map(i => ("a", s"v$i")) // overlaps b0
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
      assert(got.toSeq == Seq(
        (0L, "a", prefixEst(b0.map(_._2))),
        (1L, "a", prefixEst((b0 ++ b1).map(_._2).distinct))),
        s"running estimates must equal closed-form prefix sketches: $got")
      // crash-window replay: batch file re-appended WITHOUT its
      // marker — duplicated sketch rows change no estimate, and
      // compaction collapses them back
      val dup = spark.read.parquet(s"$dir/sk")
      val before = dup.count()
      graft.sources.Store.atomicAppend(
        dup.filter(col("kmv_hash") % 2 === 0), s"$dir/sk", "batch-replayed")
      got.clear()
      input.addData(Seq(("a", "v121"))); q.processAllAvailable()
      assert(got.head._3 == prefixEst(((b0 ++ b1).map(_._2) :+ "v121").distinct),
        "estimate unchanged by duplicated store rows (KMV union is idempotent)")
      val rep = Sketches.compactSketches(spark, s"$dir/sk", Seq("g"),
        graft.sources.Compact.Options(l0MaxParts = 2))
      assert(rep.merges > 0, s"compaction folded the batch files: $rep")
      assert(spark.read.parquet(s"$dir/sk").count() <= before + 1 + K,
        "replay-duplicated rows collapsed on (g, kmv_hash)")
    } finally q.stop()
  }

  test("count-min: bounded cells, merge additivity, one-sided estimates") {
    import spark.implicits._
    val (d, w) = (4, 256)
    val xs = (1 to 2000).map(i => ("g", s"v${i % 37}")) ++
      (1 to 500).map(_ => ("g", "hot"))
    val df = xs.toDF("g", "v")
    val sk = Sketches.countMin(df, Seq("g"), col("v"), d, w)
    // bounded cell count; every depth row conserves the total count
    assert(sk.count() <= d.toLong * w)
    assert(sk.groupBy("d").agg(sum("cnt")).collect()
      .map(_.getLong(1)).toSet == Set(xs.size.toLong))
    // estimates are NEVER below truth (one-sided); the hot key stays
    // near-exact at this load factor
    val truth = xs.groupBy(_._2).map { case (k, g) => (k, g.size.toLong) }
    val probes = (truth.keys.toSeq :+ "never-seen").toDF("v")
    val est = Sketches.cmEstimate(sk, Seq("g"), probes, col("v"), d, w)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    truth.foreach { case (k, t) => assert(est(k) >= t, s"$k: ${est(k)} < $t") }
    assert(est("hot") >= 500L && est("hot") <= 700L, s"hot: ${est("hot")}")
    assert(est("never-seen") <= 200L, s"absent stays collision-bounded: $est")
    // merge IS count addition on (g, d, b): split sketches re-summed
    // equal the whole-input sketch cell-for-cell
    val merged = Sketches.countMin(xs.take(1100).toDF("g", "v"), Seq("g"), col("v"), d, w)
      .unionByName(Sketches.countMin(xs.drop(1100).toDF("g", "v"), Seq("g"), col("v"), d, w))
      .groupBy("g", "d", "b").agg(sum("cnt").as("cnt"))
    def cells(x: org.apache.spark.sql.DataFrame) = x.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(cells(sk) == cells(merged))
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
