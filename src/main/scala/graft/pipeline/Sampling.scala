package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — the training-data pipeline step
  * that sets per-source/per-language inclusion rates when composing a
  * corpus. `rand()`-based sampling (`df.stat.sampleBy`) is neither
  * reproducible across runs nor auditable; the standard fix at scale
  * is a HASH GATE: a row is kept iff a hash of its identity falls
  * under its stratum's rate. Same row → same verdict on every run,
  * every engine, any partitioning — and downstream incremental jobs
  * see a stable subset.
  */
object Sampling {

  /** Portable per-row gate in [0, 1000): md5 of "stratum:id" (first 8
    * hex digits), mod 1000 — codegen'd Catalyst expressions, and a
    * SQL oracle recomputes it verbatim. */
  def hashGate(strataCol: Column, idCol: Column): Column =
    conv(substring(md5(concat(strataCol.cast("string"), lit(":"),
      idCol.cast("string"))), 1, 8), 16, 10).cast("long") % 1000

  /** Keep each row iff its [[hashGate]] < its stratum's permille rate.
    * `permille`: stratum value → keep rate in ‰ (0..1000); strata
    * absent from the map keep `defaultPermille`. One codegen'd filter,
    * no shuffle, no state — the gate pushes into the scan like any
    * other predicate. */
  def sampleByStrata(df: DataFrame, strataCol: String, idCol: String,
                     permille: Map[String, Int],
                     defaultPermille: Int = 1000): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashGate(col(strataCol), col(idCol)) < rate)
  }

  /** Deterministic train/validation/test assignment — the split step
    * every training pipeline runs before anything touches the data.
    * Random splits leak across reruns and engines; the standard fix is
    * the same hash gate as [[sampleByStrata]]: a row's split follows
    * from `md5("split:" + id) mod 1000` alone, so the assignment is
    * stable under reprocessing, appends (new rows never reshuffle old
    * ones), any partitioning, and any engine that can compute md5.
    * Gate ranges: [0, test) → test, [test, test+val) → validation,
    * the rest → train. A NULL id gets a NULL split (the gate is
    * undefined without an identity — same convention as
    * [[sampleByStrata]], where null keys never pass the gate; an
    * `otherwise("train")` would silently leak every id-less row into
    * the training set). Pure codegen'd projection — no shuffle, no
    * state, scales with input splits. */
  def assignSplit(df: DataFrame, idCol: String,
                  valPermille: Int, testPermille: Int,
                  splitCol: String = "split"): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"val + test permille must fit in [0, 1000], got $valPermille + $testPermille")
    require(!df.columns.contains(splitCol),
      s"input already has a column named '$splitCol'")
    val gate = hashGate(lit("split"), col(idCol))
    df.withColumn(splitCol,
      when(gate < testPermille, "test")
        .when(gate < testPermille + valPermille, "validation")
        .when(gate.isNotNull, "train"))
  }

  /** Temperature-scaled mixture rebalancing — the multi-source /
    * multilingual corpus-composition op: resample so source shares
    * follow `p_s^(1/T)` instead of the raw `p_s`. Realized by
    * SUBSAMPLING (never replication): source `s` keeps rate
    * `(n_min / n_s)^(1 - 1/T)`, which is 1 for the smallest source.
    * `T = 1` keeps everything (no reshaping); `T → ∞` equalizes
    * expected kept counts across sources at `n_min` each.
    *
    * Per-stratum counts come from one partial-aggregated `groupBy` —
    * #strata rows to the driver (sources/languages are few by
    * definition); the computed rates feed the same deterministic,
    * scan-pushed [[hashGate]] as [[sampleByStrata]], so the selection
    * is reproducible and auditable. The tiny epsilon inside `floor`
    * absorbs last-ulp `pow` differences between engines so the SQL
    * oracle lands on identical permille rates.
    */
  def temperatureMixture(df: DataFrame, strataCol: String, idCol: String,
                         temperature: Double): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    // null strata never pass the hash gate (md5(null) = null → filter
    // false), so they are excluded from the rate computation too
    // rather than NPE-ing on the null group key
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.get(0).toString -> r.getLong(1))
      .toMap
    require(counts.nonEmpty, "empty input: no strata to rebalance")
    val nMin = counts.values.min
    val a = 1.0 - 1.0 / temperature
    val permille = counts.map { case (s, n) =>
      s -> math.floor(1000.0 * math.pow(nMin.toDouble / n, a) + 1e-6).toInt
    }
    sampleByStrata(df, strataCol, idCol, permille, defaultPermille = 0)
  }
}
