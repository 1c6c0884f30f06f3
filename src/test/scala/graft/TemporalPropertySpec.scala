package graft

import graft.engine.Temporal
import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

/** Randomized differential trials for the temporal operators and the
  * KMV sketch.
  *
  * asofJoin must agree row-for-row with an O(n·m) plain-Scala model
  * (latest right at-or-before, tolerance, greatest-tie-break wins) on
  * random event/update streams with engineered ties — equal
  * timestamps across sides, equal timestamps within the right side,
  * keys with no matches, and tolerance edges landing exactly on the
  * boundary.
  *
  * KMV must return the EXACT distinct count below k on random
  * multisets, and the merge of random partition sketches must be
  * bit-identical to the whole-set sketch for every random split
  * (the union-of-k-minima ⊇ global-k-minima argument, exercised
  * rather than assumed). */
class TemporalPropertySpec extends SparkTestBase {

  // Fixed seed/count for CI; GRAFT_FUZZ_SEED / GRAFT_FUZZ_CASES crank
  // deep exploratory sessions (same convention as the other
  // *PropertySpec fuzz suites).
  private val fuzzSeed =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)
  private val trials =
    sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(6)

  test("asofJoin agrees with the sequential model on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(fuzzSeed)
    for (t <- 1 to trials) {
      val nKeys = 1 + rnd.nextInt(4)
      val left = (1 to 60).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong * 5, i.toLong)
      } // (key, t, eventId) — coarse grid forces cross/within-side ties
      val right = (1 to 40).map { i =>
        (rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(40).toLong * 5,
          s"p${rnd.nextInt(8)}")
      } // (key, rt, payload); key nKeys has no left rows
      val tol = if (t % 2 == 0) Some(25L) else None

      val got = Temporal.asofJoin(
        left.toDF("k", "t", "eid"), right.toDF("k", "rt", "pay"),
        Seq("k"), "t", "rt", tolerance = tol, tieBreak = Seq("pay"))
        .collect()
        .map(r => r.getAs[Long]("eid") ->
          ((Option(r.getAs[Any]("asof_ts")), Option(r.getAs[Any]("pay")))))
        .toMap

      val model = left.map { case (k, lt, eid) =>
        val cands = right.filter(u => u._1 == k && u._2 <= lt &&
          tol.forall(w => u._2 >= lt - w))
        if (cands.isEmpty) eid -> ((None, None))
        else {
          // latest time, greatest payload among equal times
          val best = cands.maxBy(c => (c._2, c._3))
          eid -> ((Some(best._2), Some(best._3)))
        }
      }.toMap
      assert(got == model, s"trial $t: spark=$got model=$model")
    }
  }

  test("kmv: exact below k on random multisets; merge == whole on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(fuzzSeed + 97L)
    for (t <- 1 to trials) {
      val k = 16 + rnd.nextInt(48)
      val distinct = 1 + rnd.nextInt(3 * k)
      val values = (1 to distinct).flatMap(i =>
        Seq.fill(1 + rnd.nextInt(3))(s"trial$t-val$i"))
      val parts = values.map(v => (s"p${rnd.nextInt(5)}", v))

      val whole = Sketches.kmvEstimate(
        Sketches.kmvHashes(values.map(("w", _)).toDF("g", "v"), Seq("g"), col("v"), k),
        Seq("g"), k).collect().head
      if (distinct < k)
        assert(whole.getAs[Long]("distinct_est") == distinct.toLong,
          s"trial $t: below k must be exact")
      val merged = Sketches.kmvEstimate(
        Sketches.kmvHashes(
          Sketches.kmvHashes(parts.toDF("g", "v"), Seq("g"), col("v"), k)
            .withColumn("g", lit("w")),
          Seq("g"), col("kmv_hash"), k, preHashed = true),
        Seq("g"), k).collect().head
      assert(merged.getAs[Long]("kth_hash") == whole.getAs[Long]("kth_hash") &&
        merged.getAs[Long]("n_kept") == whole.getAs[Long]("n_kept") &&
        merged.getAs[Long]("distinct_est") == whole.getAs[Long]("distinct_est"),
        s"trial $t: merged sketch must equal the whole-set sketch")
    }
  }
}
