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
}
