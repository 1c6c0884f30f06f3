package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.engine.Tables

/** Dev-only stage profiler for [[Dedup.prodParityReport]]: times each
  * sub-stage of the parity pipeline in isolation so optimization work
  * targets the measured hot spot instead of a guess. Not part of the
  * driver contract. */
object ProfileParity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    // ngram settings: n=2, 16 hashes, 8 bands, threshold 0.05
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (ngram settings) ---")
      val (reps, starPairs) = Dedup.collapseExact(docs, "doc_id", "text")
      val stars = time("collapseExact+stars") {
        starPairs.select(col("id_a"), col("id_b")).localCheckpoint()
      }
      val xxsh = time("xx shingle frame") {
        Dedup.withShingleHashes(reps.select(col("doc_id"), col("text")),
          "text", 2, "__sh").select(col("doc_id"), col("__sh")).localCheckpoint()
      }
      val prodCand = time("prod band+candidates") {
        Dedup.candidatePairs(
          Dedup.lshBandsFromHashes(xxsh, "doc_id", "__sh", 16, 8), "doc_id", 1000)
          .localCheckpoint()
      }
      println(s"  prod candidates: ${prodCand.count()}")
      val prodVer = time("prod verify") {
        Dedup.verifiedPairs(prodCand, xxsh, "doc_id", "__sh", 0.05).localCheckpoint()
      }
      println(s"  prod verified: ${prodVer.count()}")
      val psh = time("portable shingle frame") {
        Dedup.portableShingleHashes(reps, "doc_id", "text", 2, "__sh").localCheckpoint()
      }
      val portCand = time("port band+candidates") {
        Dedup.candidatePairs(
          Dedup.lshBandsPortableFromHashes(psh, "doc_id", "__sh", 16, 8), "doc_id", 1000)
          .localCheckpoint()
      }
      println(s"  port candidates: ${portCand.count()}")
      val portVer = time("port verify") {
        Dedup.verifiedPairs(portCand, psh, "doc_id", "__sh", 0.05).localCheckpoint()
      }
      println(s"  port verified: ${portVer.count()}")
      val reVer = time("re-verify prod under md5") {
        Dedup.verifiedPairs(prodVer.select(col("id_a"), col("id_b")),
          psh, "doc_id", "__sh", -1.0).localCheckpoint()
      }
      println(s"  re-verified: ${reVer.count()}")
      time("final counts") {
        val bad = reVer.filter(col("jaccard") < 0.05).count()
        val common = prodVer.select(col("id_a"), col("id_b"))
          .join(portVer.select(col("id_a"), col("id_b")), Seq("id_a", "id_b")).count()
        println(s"  bad=$bad common=$common stars=${stars.count()}")
      }
    }
    spark.stop()
  }
}
