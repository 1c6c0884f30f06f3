package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — the step that combines a
  * lexical ranking ([[TextAnalysis.bm25TopK]] /
  * [[TextAnalysis.bm25IndexedTopK]]) with a semantic one (the
  * [[Similarity]] ANN top-k family) into one result list, the
  * standard shape of a RAG / search stack.
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR'09): each list
  * contributes `1 / (k + rank)` for every id it ranks; ids high on
  * ANY list surface, and k (conventionally 60) damps the head. Only
  * RANKS are consumed, so the fused score is scale-free — BM25
  * micro-nats and cosine similarities never need calibrating against
  * each other.
  *
  * Engine-portable like the rest of the scoring stack: each
  * contribution is `floor(1e6 / (k + rank))` as a long, so the fused
  * score is an exact integer sum (associative — partitioning cannot
  * reorder it) and a SQL oracle replays it bit for bit.
  */
object Retrieval {

  /** Fuse ranked lists (each carrying `idCol` and a 1-based
    * `rankCol`) into (idCol, rrf_micro, lists_hit, rank), rank
    * 1-based by (rrf_micro DESC, id ASC), at most `topK` rows.
    *
    * Scale shape: the inputs are top-k lists — thousands of rows, not
    * corpora — so the union + one aggregate + one rank window is
    * driver-free and broadcast-free; the heavy lifting happened in
    * the rankers. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              topK: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty && topK > 0, "need ranked lists and topK > 0")
    val tagged = lists.map { df =>
      df.select(col(idCol).cast("long").as(idCol),
        floor(lit(1e6) / (lit(kRrf).cast("double") +
          col(rankCol).cast("double"))).cast("long").as("__c"))
    }.reduce(_ unionByName _)
    val w = Window.orderBy(col("rrf_micro").desc, col(idCol).asc)
    tagged.groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf_micro"), count(lit(1)).as("lists_hit"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
