package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
