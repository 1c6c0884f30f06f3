package graft

import graft.pipeline.Sharding
import org.apache.spark.sql.functions._

/** Randomized trials: the distributed prefix-sum packing must agree
  * with a trivially-correct sequential walk of the same total order
  * (bucket, id) on every trial — any drift in bucketing, offset
  * arithmetic, or window framing shows up as a shard mismatch. */
class ShardingPropertySpec extends SparkTestBase {

  /** Reference md5 bucket — recomputed from first principles (JDK
    * MessageDigest), independent of Spark's expression tree. */
  private def md5Bucket(id: Long, buckets: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 4), 16) % buckets
  }

  test("randomized packing trials match the sequential reference walk") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 8) {
      val n = 30 + rnd.nextInt(270)
      val ids = Iterator.continually(math.abs(rnd.nextLong()) % 1000000L)
        .distinct.take(n).toSeq
      val docs = ids.map(id => (id, 1L + rnd.nextInt(200)))
      val budget = 100L + rnd.nextInt(900)
      val buckets = Seq(1, 4, 16, 64)(rnd.nextInt(4))

      // sequential reference: walk (bucket, id) order, assign by the
      // exclusive running token offset
      var run = 0L
      val expected = docs
        .sortBy { case (id, _) => (md5Bucket(id, buckets), id) }
        .map { case (id, tok) =>
          val shard = run / budget
          run += tok
          id -> shard
        }.toMap

      val got = Sharding.packShards(docs.toDF("doc_id", "n_tok"),
          "doc_id", col("n_tok"), budget, buckets)
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      assert(got == expected,
        s"trial $trial (n=$n budget=$budget buckets=$buckets): " +
          s"${got.toSet.diff(expected.toSet).take(5)} vs expected " +
          s"${expected.toSet.diff(got.toSet).take(5)}")

      // fill invariant: every shard except the last holds
      // budget ± max doc size worth of tokens
      val byShard = docs.map { case (id, tok) => expected(id) -> tok }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val maxTok = docs.map(_._2).max
      val last = byShard.keys.max
      byShard.foreach { case (sid, tok) =>
        if (sid != last)
          assert(tok >= budget - maxTok && tok <= budget + maxTok,
            s"trial $trial shard $sid fill $tok outside budget=$budget ± $maxTok")
      }
    }
  }
}
