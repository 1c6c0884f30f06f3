package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage profiler for any driver query: runs the named
  * SparkEntry queries once warm, once timed, with a stage listener,
  * and prints each stage's executor task-time sum, record counts, and
  * the wall total — separating executor compute from driver overhead
  * (planning, AQE re-optimization, codegen) so optimization targets
  * the measured hot spot. Not part of the driver contract.
  *
  *   runMain graft.tools.StageProfile [sfDir] <query> [query ...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val (dirs, qnames) = args.partition(a => new java.io.File(a).isDirectory)
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.1")
    require(qnames.nonEmpty, "pass at least one query name")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // match the bench session's engine config (see Bench.scala)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (name <- qnames) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).count() // warm: codegen cache, page cache, footers
      spark.sparkContext.getPersistentRDDs
        .valuesIterator.foreach(_.unpersist(blocking = true))
      System.gc()

      // the listener bus delivers on its own thread — synchronize the
      // buffer and drain below by polling until the count stabilizes,
      // or late completion events silently vanish from the profile
      val stages = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, Long, Long, Long, Int)]
      val listener = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          stages.synchronized {
            stages += ((si.stageId,
              si.name.takeWhile(_ != '\n').take(60),
              m.executorRunTime, m.executorCpuTime / 1000000L,
              m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten,
              si.numTasks))
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain: poll until no new completion arrives for two checks
      var seen = -1
      var stable = 0
      while (stable < 2) {
        Thread.sleep(200)
        val n = stages.synchronized(stages.size)
        if (n == seen) stable += 1 else { seen = n; stable = 0 }
      }
      spark.sparkContext.removeSparkListener(listener)

      val snap = stages.synchronized(stages.toVector)
      val runSum = snap.map(_._3).sum / 1e3
      val cpuSum = snap.map(_._4).sum / 1e3
      println(f"\n===== $name: wall $wall%.2f s, executor-run sum $runSum%.2f s " +
        f"(cpu $cpuSum%.2f s), ${snap.size} stages =====")
      for ((id, nm, run, cpu, recs, nt) <- snap.sortBy(-_._3).take(15))
        println(f"  stage $id%4d run ${run / 1e3}%6.2f s  cpu ${cpu / 1e3}%6.2f s  " +
          f"tasks $nt%3d  outRecs $recs%9d  $nm")
    }
    spark.stop()
  }
}
