package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame

/** Randomized differential trials for the corpus pipelines.
  *
  * Banded near-dup soundness: on random small corpora (forced exact
  * duplicates + single-token mutations), every pair the pipeline
  * emits must be a TRUE near-dup pair under a from-first-principles
  * n-gram Jaccard model — banding is allowed to miss pairs (LSH is a
  * recall sample), but a pair it emits with a wrong Jaccard, below
  * threshold, or between unrelated docs is a correctness bug in
  * shingling, banding, capping, or the verify join. Exact-duplicate
  * groups must always come back complete (the star-pair path is
  * hash-independent), and the whole pipeline must be run-to-run
  * deterministic.
  *
  * TF-IDF exactness: [[graft.pipeline.TextAnalysis.topTfidfTerms]]
  * must agree row-for-row with a sequential tf-idf model (same
  * quantized idf, same deterministic tie-break) on random corpora. */
class DedupPropertySpec extends SparkTestBase {

  /** Reference n-gram set: sliding windows of n tokens, distinct. */
  private def grams(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def trueJaccard(a: String, b: String, n: Int): Option[Double] = {
    val (ga, gb) = (grams(a, n), grams(b, n))
    if (ga.isEmpty || gb.isEmpty) None
    else Some(ga.intersect(gb).size.toDouble / ga.union(gb).size)
  }

  private def collect(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def checkSound(pairs: Set[(Long, Long, Double)],
                         byId: Map[Long, String], n: Int,
                         threshold: Double, label: String): Unit = {
    for ((a, b, j) <- pairs) {
      assert(a != b, s"$label: self-pair $a")
      if (byId(a) == byId(b))
        assert(j == 1.0, s"$label: exact dup ($a,$b) reported j=$j")
      else {
        val tj = trueJaccard(byId(a), byId(b), n)
        assert(tj.isDefined,
          s"$label: pair ($a,$b) involves a doc with no $n-grams")
        assert(math.abs(tj.get - j) < 1e-9,
          s"$label: pair ($a,$b) reported j=$j, true ${tj.get}")
        assert(j >= threshold,
          s"$label: pair ($a,$b) j=$j below threshold $threshold")
      }
    }
  }

  test("randomized corpora: topTfidfTerms matches a sequential tf-idf model exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (trial <- 1 to 4) {
      val nDocs = 20 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(4)
      val docs = (0 until nDocs).map { i =>
        val len = 3 + rnd.nextInt(25)
        (i.toLong, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // sequential model: tf per (doc, token); df per token; quantized
      // idf; rank by (score desc, token asc) and keep top k
      val tf = docs.flatMap { case (id, t) =>
        t.split(" ").groupBy(identity).map { case (tok, os) => (id, tok, os.length.toLong) }
      }
      val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val idf = dfreq.map { case (tok, c) =>
        tok -> math.floor(math.log(nDocs.toDouble / c) * 1e6).toLong
      }
      val expected = tf.groupBy(_._1).flatMap { case (id, rows) =>
        rows.map { case (_, tok, c) => (tok, c, c * idf(tok)) }
          .sortBy { case (tok, _, score) => (-score, tok) }
          .take(k).zipWithIndex
          .map { case ((tok, c, score), r) => (id, tok, c, score, r + 1) }
      }.toSet
      val got = graft.pipeline.TextAnalysis.topTfidfTerms(
          docs.toDF("doc_id", "text").repartition(3), "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .toSet
      assert(got == expected,
        s"trial $trial (n=$nDocs k=$k): ${got.diff(expected).take(3)} vs " +
          s"missing ${expected.diff(got).take(3)}")
    }
  }

  test("randomized corpora: emitted pairs are true near-dups; exact groups complete; runs deterministic") {
    import spark.implicits._
    // GRAFT_FUZZ_SEED / GRAFT_FUZZ_CASES crank deep sessions (same
    // convention as EsPropertySpec / FunnelPropertySpec)
    val rnd = new scala.util.Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L))
    val nTrials = sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu")
    val n = 3
    for (trial <- 1 to nTrials) {
      val threshold = Seq(0.3, 0.5, 0.8)(rnd.nextInt(3))
      val nBase = 25 + rnd.nextInt(35)
      val base = (0 until nBase).map { i =>
        // a couple of deliberately short docs exercise the <n-token path
        val len = if (i % 13 == 0) 1 + rnd.nextInt(2) else 6 + rnd.nextInt(18)
        Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      var nextId = nBase.toLong
      val extra = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      // forced exact duplicates (star-pair path)
      for (_ <- 0 until 6) {
        extra += ((nextId, base(rnd.nextInt(nBase)))); nextId += 1
      }
      // forced near-dups: one token mutated
      for (_ <- 0 until 6) {
        val toks = base(rnd.nextInt(nBase)).split(" ").toVector
        val mut = toks.updated(rnd.nextInt(toks.length),
          vocab(rnd.nextInt(vocab.size)))
        extra += ((nextId, mut.mkString(" "))); nextId += 1
      }
      val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++ extra
      val byId = docs.toMap
      val df = docs.toDF("doc_id", "text").repartition(4)

      val portable = collect(Dedup.minhashDupPairsPortable(
        df, "doc_id", "text", shingleN = n, threshold = threshold))
      val prod = collect(Dedup.minhashDupPairs(
        df, "doc_id", "text", shingleN = n, threshold = threshold))
      checkSound(portable, byId, n, threshold, s"trial $trial portable")
      checkSound(prod, byId, n, threshold, s"trial $trial prod")

      // exact-duplicate groups must come back complete as stars from
      // the min id, regardless of banding luck (both pipelines)
      val groups = docs.groupBy(_._2).values.filter(_.size > 1)
      for (g <- groups; pairs <- Seq(portable, prod)) {
        val ids = g.map(_._1).sorted
        val rep = ids.head
        for (d <- ids.tail)
          assert(pairs.contains((rep, d, 1.0)),
            s"trial $trial: exact-dup pair ($rep,$d) missing")
      }

      // determinism: an identical second run yields the identical set
      val portable2 = collect(Dedup.minhashDupPairsPortable(
        df, "doc_id", "text", shingleN = n, threshold = threshold))
      assert(portable2 == portable, s"trial $trial: non-deterministic run")
    }
  }
}
