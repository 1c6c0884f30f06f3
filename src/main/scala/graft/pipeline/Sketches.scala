package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Mergeable distinct-count sketches — the way COUNT(DISTINCT) is
  * answered at 100 TB: each partition/group keeps a bounded summary,
  * summaries merge associatively, and the estimate comes from the
  * summary alone. The KMV (k-minimum-values) sketch is chosen over
  * HLL here because it is EXACTLY portable: its state is "the k
  * smallest 60-bit md5 hashes", which DuckDB reproduces bit-for-bit
  * ([[Dedup.md5Hash60]]'s trick), so every sketch, merge, and
  * estimate is hash-checkable against the oracle — no approximation
  * slack in the test contract, the approximation is only vs the TRUE
  * cardinality.
  *
  * Estimator (Bar-Yossef et al. 2002): with H = k-th smallest hash in
  * a space of size 2^60, distinct ≈ (k-1) * 2^60 / H; exact (= count
  * of retained hashes) below k. The arithmetic runs in IEEE double in
  * both engines ((k-1)*2^60 is exactly representable for k ≤ 2^9) and
  * is floored to a BIGINT, so Spark and DuckDB agree bit-for-bit.
  */
object Sketches {

  /** The sketch rows: the ≤ k smallest distinct 60-bit hashes of
    * `value` per group, as (groupCols…, kmv_hash). Pass
    * `preHashed = true` when `value` already IS a kmv_hash column
    * (merging sketches: re-sketching sketch rows under a coarser
    * grouping is exactly KMV union, since the union of per-group
    * k-minima is a superset of the global k-minima).
    *
    * Plan shape: distinct (map-side partial) then a rank-limit window
    * that Spark executes as WindowGroupLimit(Partial/Final) — the
    * per-partition top-k prune happens map-side in codegen, so the
    * exchange after the distinct carries at most k rows per group per
    * partition, never the full distinct set.
    */
  def kmvHashes(
      df: DataFrame,
      groupCols: Seq[String],
      value: Column,
      k: Int,
      preHashed: Boolean = false): DataFrame = {
    val h = if (preHashed) value else Dedup.md5Hash60(value.cast("string"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("kmv_hash"))
    df.select(groupCols.map(col) :+ h.as("kmv_hash"): _*)
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Collapse sketch rows to one row per group:
    * (groupCols…, n_kept, kth_hash, distinct_est). `k` must be the
    * value the sketch was built with. */
  def kmvEstimate(hashes: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2 && k <= 512, s"k=$k outside the exact-double range [2, 512]")
    hashes
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("kmv_hash")).as("kth_hash"))
      .withColumn("distinct_est",
        when(col("n_kept") < k, col("n_kept")).otherwise(
          floor(lit((k - 1).toDouble * 1152921504606846976.0d) /
            col("kth_hash").cast("double")).cast("long")))
  }

  /** Equi-width histogram sketch over an INTEGER domain — the
    * mergeable quantile path at 100 TB: each group reduces map-side
    * to ≤ nBuckets count rows, sketches merge by adding counts, and
    * quantiles come from the cumulative histogram alone. Integer
    * bucket arithmetic end to end (the one division is
    * floor-over-double of exactly-representable longs), so DuckDB
    * replays it bit-for-bit — a deterministic complement to the exact
    * `percentile` path (q_es_percentiles), which needs a full sort at
    * scale where this needs one map-side-combined aggregate.
    *
    * Values clamp into the edge buckets (the sketch stays total over
    * outliers; pick [lo, hi) from domain knowledge). */
  def histogram(df: DataFrame, groupCols: Seq[String], value: Column,
                lo: Long, hi: Long, nBuckets: Int): DataFrame = {
    require(hi > lo && nBuckets > 0 && (hi - lo) % nBuckets == 0,
      s"[$lo,$hi) must split evenly into $nBuckets buckets")
    val raw = floor((value - lit(lo)).cast("double") * nBuckets / (hi - lo).toDouble)
      .cast("long")
    df.select(groupCols.map(col) :+
        least(lit(nBuckets - 1L), greatest(lit(0L), raw)).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** One quantile estimate per group from histogram rows: rank =
    * ceil(q·total); the first bucket whose cumulative count reaches
    * it, linearly interpolated — (groupCols…, q, est). Everything
    * after the histogram is ≤ nBuckets rows per group. */
  def histQuantile(hist: DataFrame, groupCols: Seq[String],
                   lo: Long, hi: Long, nBuckets: Int, q: Double): DataFrame = {
    val width = (hi - lo) / nBuckets
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank", ceil(lit(q) * sum(col("cnt")).over(wAll)).cast("long"))
      .filter(col("cum") >= col("rank"))
      .groupBy(groupCols.map(col): _*)
      .agg(min_by(struct(col("bucket"), col("cnt"), col("cum"), col("rank")),
        col("bucket")).as("__b"))
      .select(groupCols.map(col) ++ Seq(lit(q).as("q"),
        (lit(lo) + col("__b.bucket") * width +
          floor(lit(width.toDouble) *
            (col("__b.rank") - col("__b.cum") + col("__b.cnt")).cast("double") /
            col("__b.cnt").cast("double")).cast("long")).as("est")): _*)
  }

  /** Count-min sketch cells (Cormode & Muthukrishnan 2005) for
    * `value` per group: rows (groupCols…, d, b, cnt) where (d, b)
    * counts the values whose d-th hash bucket is b — `depth` disjoint
    * 20-bit md5 slices mod `width`, the SAME portable hash space as
    * the KMV sketch and the manifest bloom index, so DuckDB replays
    * every cell bit-for-bit. The sketch is at most depth×width rows
    * per group regardless of value cardinality (the 100 TB frequency
    * table that fits in memory when the exact one cannot); map-side
    * partial aggregation reduces before the exchange, and sketches
    * MERGE by adding `cnt` on (group, d, b) — across parts, shards,
    * or streaming batches. Null values contribute nothing. */
  def countMin(df: DataFrame, groupCols: Seq[String], value: Column,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 6,
      "depth must be 1..6 (one md5 yields six disjoint 20-bit slices)")
    require(width >= 16 && width <= (1 << 20), "width must be in [16, 2^20]")
    val hx = md5(value.cast("string"))
    val buckets = (0 until depth).map(d =>
      (conv(substring(hx, 1 + 5 * d, 5), 16, 10).cast("long") % width).cast("int"))
    df.select(groupCols.map(col) :+
        posexplode(array(buckets: _*)).as(Seq("d", "b")): _*)
      .filter(col("b").isNotNull)
      .groupBy((groupCols :+ "d" :+ "b").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point frequency estimates from a count-min sketch ALONE:
    * est(v) = min over depths of the cell count at v's bucket, with
    * an absent cell reading 0 — the classic ONE-SIDED estimate
    * (never below the true count, above only on collisions in every
    * row). `probes` is a small frame of candidate values (broadcast
    * against the group grid); raw data is never rescanned. Returns
    * (groupCols…, probe, est) with `probe` in canonical string
    * form. The sketch is referenced TWICE (group grid + cell join) —
    * persist or localCheckpoint a scan-expensive sketch before
    * probing, or its lineage recomputes per use. */
  def cmEstimate(sketch: DataFrame, groupCols: Seq[String],
                 probes: DataFrame, probe: Column,
                 depth: Int, width: Int): DataFrame = {
    val hx = md5(probe.cast("string"))
    val pb = probes.select(probe.cast("string").as("probe"),
      posexplode(array((0 until depth).map(d =>
        (conv(substring(hx, 1 + 5 * d, 5), 16, 10).cast("long") % width)
          .cast("int")): _*)).as(Seq("d", "b")))
    // groups × probes grid so absent cells read 0, not "missing row"
    sketch.select(groupCols.map(col): _*).distinct()
      .crossJoin(broadcast(pb))
      .join(sketch, groupCols :+ "d" :+ "b", "left")
      .groupBy((groupCols :+ "probe").map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Set operations on two sketches (Beyer et al. 2007): estimate
    * |A∪B| and |A∩B| from the k-minima alone — the audience-overlap
    * question ("how many users did BOTH X and Y") answered without
    * ever joining the raw sets.
    *
    * Input: two sketch-row frames (`kmv_hash` plus `groupCols`, built
    * with the same k). Per group: merge → union sketch (kth hash U,
    * union estimate as [[kmvEstimate]]); the intersection sample is
    * the hashes ≤ U present in BOTH sides' sketches, and
    * |A∩B| ≈ (|sample∩| / n_kept) · est_union — exact when both sides
    * kept fewer than k (the sketches then ARE the sets). All
    * arithmetic is engine-portable: integer counts, one double
    * multiply/divide on exactly-representable inputs, floored.
    *
    * Output: (groupCols…, n_union_kept, union_kth, est_union,
    * n_inter_sample, est_intersection). */
  def kmvOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                 k: Int): DataFrame = {
    val union = kmvEstimate(
      kmvHashes(a.unionByName(b), groupCols, col("kmv_hash"), k, preHashed = true),
      groupCols, k)
      .withColumnRenamed("n_kept", "n_union_kept")
      .withColumnRenamed("kth_hash", "union_kth")
      .withColumnRenamed("distinct_est", "est_union")
    val inBoth = a.select(groupCols.map(col) :+ col("kmv_hash"): _*)
      .intersect(b.select(groupCols.map(col) :+ col("kmv_hash"): _*))
    // conditional count, NOT filter-then-group: a group whose common
    // hashes all rank past the union kth must still emit a 0 row
    val inter = union.join(inBoth, groupCols, "left")
      .groupBy((groupCols ++ Seq("n_union_kept", "union_kth", "est_union")).map(col): _*)
      .agg(count(when(col("kmv_hash") <= col("union_kth"), lit(1)))
        .as("n_inter_sample"))
    inter.withColumn("est_intersection",
      floor(col("n_inter_sample").cast("double") * col("est_union").cast("double") /
        col("n_union_kept").cast("double")).cast("long"))
  }

  /** Streaming running-distinct: per micro-batch, merge the batch's
    * KMV sketch into a persisted sketch store and hand `sink` the
    * post-batch running estimates (groupCols…, n_kept, kth_hash,
    * distinct_est).
    *
    * The store holds sketch ROWS (groupCols…, kmv_hash), ≤ k per
    * group per appended batch, written atomically per batch with the
    * marker-after-append replay guard [[StreamingDedup]] established.
    * KMV makes idempotence trivial where dedup needed an anti-join:
    * the merge re-sketches through `distinct`, so a replayed append
    * (crash between append and marker) changes NO estimate — sketch
    * union is idempotent by construction. [[compactSketches]] folds
    * the accumulated batch files and collapses those replay
    * duplicates; the read path is correct either way because every
    * load re-top-ks.
    *
    * Scale: the store side never exceeds k rows × groups × appended
    * batches between compactions, the batch side is micro-batch
    * sized, and the merge's shuffle carries only sketch rows — the
    * raw stream is reduced map-side before anything persistent sees
    * it. */
  def streamingKmv(rows: DataFrame, storeDir: String, groupCols: Seq[String],
                   value: Column, k: Int)(
                   sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val bs = kmvHashes(batch, groupCols, value, k).persist()
      try {
        val store = StreamingDedup.loadSignatures(spark, storeDir, bs)
        val merged = kmvEstimate(
          kmvHashes(store.unionByName(bs), groupCols, col("kmv_hash"), k,
            preHashed = true),
          groupCols, k)
        sink(merged, batchId)
        // marker-after-append replay guard, shared with the other
        // streaming stores (see Store.atomicAppendOnce); a replayed
        // batch duplicating rows is estimate-neutral anyway (KMV
        // union is idempotent), the marker just keeps the store tidy
        graft.sources.Store.atomicAppendOnce(
          bs, storeDir, f"batch-$batchId%09d"): Unit
      } finally { bs.unpersist(); () }
    }

  /** Sketch-store compaction: fold batch files, collapsing any
    * replay-duplicated sketch rows on their full key. Bounding the
    * store back to ≤ k rows per group (dropping hashes a batch pushed
    * past rank k) is the read path's job — estimates never need it,
    * so the fold stays a pure row-collapse. */
  def compactSketches(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                      groupCols: Seq[String],
                      opts: graft.sources.Compact.Options =
                        graft.sources.Compact.Options()): graft.sources.Compact.Report =
    graft.sources.Compact.run(spark, storeDir,
      opts.copy(replaceOn = groupCols :+ "kmv_hash", versionCol = None))
}
