package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

/** Randomized differential trials for the retrieval stack.
  *
  * Every operator here is EXACT (integer scoring, deterministic
  * tie-breaks), so unlike the LSH trials there is no "recall sample"
  * escape hatch: on random corpora the engine must agree row for row
  * with a sequential from-first-principles model — sparse weighted
  * scoring, snippet window argmax, AND-NOT membership — and the
  * batched BM25 must equal its per-query solo runs. Seeds are fixed
  * per trial, so failures replay. */
class RetrievalPropertySpec extends SparkTestBase {

  private val vocab = Vector("alpha", "beta", "scan", "merge", "column",
    "window", "sort", "filter", "join", "spill")

  private def randomCorpus(rnd: scala.util.Random, n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = 1 + rnd.nextInt(12)
      // occasional empty tokens exercise the position-slot contract
      val toks = Seq.fill(len)(
        if (rnd.nextInt(12) == 0) "" else vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }

  private def tf(text: String): Map[String, Int] =
    text.split(" ", -1).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, g) => (t, g.length) }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
  }

  test("randomized corpora: sparse weighted scoring matches a sequential model exactly") {
    import spark.implicits._
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(1000 + trial)
      val corpus = randomCorpus(rnd, 60 + rnd.nextInt(60))
      val nW = 2 + rnd.nextInt(3)
      val weights = rnd.shuffle(vocab).take(nW)
        .map(t => (t, (rnd.nextInt(2001) - 1000).toLong))
      val topK = 1 + rnd.nextInt(20)
      // sequential model: docs matching >=1 weighted term, integer sum
      val model = corpus.flatMap { case (id, text) =>
        val f = tf(text)
        val hit = weights.filter { case (t, _) => f.contains(t) }
        if (hit.isEmpty) None
        else Some((id, hit.map { case (t, w) => f(t).toLong * w }.sum,
          hit.size.toLong))
      }.sortBy { case (id, score, _) => (-score, id) }
        .take(topK).zipWithIndex
        .map { case ((id, s, h), i) => (id, s, h, (i + 1).toLong) }
      val got = TextAnalysis.weightedTermTopKScan(
          corpus.toDF("doc_id", "text"), "doc_id", "text", weights, topK)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("score_micro"), r.getAs[Long]("terms_hit"),
          r.getAs[Long]("rank"))).sortBy(_._4).toSeq
      assert(got == model, s"trial $trial weights=$weights:\n$got\nvs\n$model")
    }
  }

  test("randomized corpora: snippet windows match a brute-force argmax; AND-NOT matches membership") {
    import spark.implicits._
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(2000 + trial)
      val corpus = randomCorpus(rnd, 40 + rnd.nextInt(40))
      val terms = rnd.shuffle(vocab).take(2 + rnd.nextInt(2))
      val width = 2 + rnd.nextInt(6)
      val dir = java.nio.file.Files.createTempDirectory(s"rsnip$trial").toFile
      try {
        TextAnalysis.buildTextIndex(corpus.toDF("doc_id", "text"),
          "doc_id", "text", dir.getAbsolutePath)
        // brute model: candidate starts are query-term positions in
        // the RAW token sequence (empties hold their slot)
        val model = corpus.flatMap { case (id, text) =>
          val toks = text.split(" ", -1)
          val occ = toks.zipWithIndex.collect {
            case (t, i) if terms.contains(t) => (t, i)
          }
          if (occ.isEmpty) None
          else {
            val best = occ.map(_._2).distinct.map { p =>
              val in = occ.filter { case (_, i) => i >= p && i < p + width }
              (in.map(_._1).distinct.length.toLong, in.length.toLong, p.toLong)
            }.minBy { case (t, o, p) => (-t, -o, p) }
            Some((id, best._3, best._1, best._2))
          }
        }.sortBy(_._1)
        val got = TextAnalysis.snippetWindow(spark, dir.getAbsolutePath,
            terms, width)
          .collect().map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Long]("snippet_start"), r.getAs[Long]("terms_in_window"),
            r.getAs[Long]("occs_in_window"))).sortBy(_._1).toSeq
        assert(got == model, s"trial $trial terms=$terms width=$width")
        // AND-NOT: membership + summed must-tf against the model
        val must = terms.take(1 + rnd.nextInt(terms.size))
        val not = Seq(rnd.shuffle(vocab.filterNot(must.contains)).head)
        val nModel = corpus.flatMap { case (id, text) =>
          val f = tf(text)
          if (must.forall(f.contains) && not.forall(t => !f.contains(t)))
            Some((id, must.map(f(_).toLong).sum))
          else None
        }.sortBy(_._1)
        val nGot = TextAnalysis.termLookupAllNot(spark, dir.getAbsolutePath,
            must, not)
          .collect().map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Long]("total_tf"))).sortBy(_._1).toSeq
        assert(nGot == nModel, s"trial $trial must=$must not=$not")
      } finally rm(dir)
    }
  }

  test("randomized query batches: batched BM25 equals per-query solo runs") {
    import spark.implicits._
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(3000 + trial)
      val corpus = randomCorpus(rnd, 80)
      val dir = java.nio.file.Files.createTempDirectory(s"rbatch$trial").toFile
      try {
        TextAnalysis.buildTextIndex(corpus.toDF("doc_id", "text"),
          "doc_id", "text", dir.getAbsolutePath)
        val qs = (1 to 2 + rnd.nextInt(3)).map(q =>
          (q.toLong, rnd.shuffle(vocab).take(1 + rnd.nextInt(3)).toSeq))
        val topK = 1 + rnd.nextInt(15)
        val batch = TextAnalysis.bm25IndexedTopKBatch(spark,
            dir.getAbsolutePath, qs, topK)
          .collect().map(r => (r.getAs[Long]("query_id"),
            r.getAs[Long]("doc_id"), r.getAs[Long]("bm25_micro"),
            r.getAs[Long]("terms_hit"), r.getAs[Long]("rank"))).toSet
        val solo = qs.flatMap { case (qid, ts) =>
          TextAnalysis.bm25IndexedTopK(spark, dir.getAbsolutePath, ts, topK)
            .collect().map(r => (qid, r.getAs[Long]("doc_id"),
              r.getAs[Long]("bm25_micro"), r.getAs[Long]("terms_hit"),
              r.getAs[Long]("rank")))
        }.toSet
        assert(batch == solo, s"trial $trial qs=$qs topK=$topK")
      } finally rm(dir)
    }
  }
}
