package graft

import graft.ingest.Ingest
import org.apache.spark.sql.functions._

/** Batch-ingestion semantics (reference ingester/src/executor.rs:
  * 120-330 and transformers/) — identity get_or_create, anonymous
  * merge, UA parsing, geo range lookup, identify version bumps. */
class IngestSpec extends SparkTestBase {

  private def feed(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_key", "seq")
  }
  private def snapshot(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_key", "id")
  }

  test("resolveIdentities keeps existing ids and ranks new keys by first-seen") {
    val raw = feed(Seq(("b", 30L), ("c", 10L), ("a", 20L), ("c", 5L), ("d", 40L)))
    val existing = snapshot(Seq(("a", 7L), ("z", 9L)))
    val m = Ingest.resolveIdentities(raw, existing)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a keeps 7; z stays registered; new keys by min(seq): c(5) -> 10, b(30) -> 11, d(40) -> 12
    assert(m == Map("a" -> 7L, "z" -> 9L, "c" -> 10L, "b" -> 11L, "d" -> 12L))
  }

  test("resolveIdentities with an empty snapshot starts ids at 1") {
    val raw = feed(Seq(("x", 2L), ("y", 1L)))
    val m = Ingest.resolveIdentities(raw, snapshot(Seq.empty))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("y" -> 1L, "x" -> 2L))
  }

  test("mergeAnonymous binds anonymous keys to the real user's id") {
    import spark.implicits._
    val mapping = snapshot(Seq(("u1", 1L), ("u2", 2L)))
    val bindings = Seq(("anon-9", "u2"), ("u1", "u2")).toDF("anonymous_key", "user_key")
    val rows = Ingest.mergeAnonymous(mapping, bindings)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // anon key resolves to the real id; a colliding "anonymous" key that
    // already IS a real key keeps its own id (no duplicate mapping rows)
    assert(rows.length == 3)
    assert(rows.toMap == Map("u1" -> 1L, "u2" -> 2L, "anon-9" -> 2L))
  }

  test("parseUserAgent classifies the major engines in rule order") {
    import spark.implicits._
    val uas = Seq(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36",
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
      "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "curl/8.4.0")
    val rows = uas.toDF("ua")
      .select(Ingest.parseUserAgent(col("ua")).as("p")).select(col("p.*"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3), r.getString(4)))
    // Edge outranks the Chrome/ token it also carries; iPhone UA is iOS
    // (not macOS despite "like Mac OS X"); unknown UA falls to Other.
    assert(rows(0) == ("Chrome", "120", "Windows", "Other"))
    assert(rows(1) == ("Edge", "120", "Windows", "Other"))
    assert(rows(2) == ("Safari", "17", "iOS", "iPhone"))
    assert(rows(3) == ("Firefox", "121", "Linux", "Other"))
    assert(rows(4) == ("Other", "", "Other", "Other"))
  }

  test("geoEnrich hits exact range boundaries and leaves gaps null") {
    import spark.implicits._
    val ranges = Seq((100L, 199L, "US"), (300L, 399L, "JP"))
      .toDF("start", "end", "country")
    val df = Seq((1L, 100L), (2L, 199L), (3L, 250L), (4L, 399L)).toDF("id", "ip")
    val out = Ingest.geoEnrich(df, "ip", ranges)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("country"))).toMap
    assert(out == Map(1L -> Some("US"), 2L -> Some("US"), 3L -> None, 4L -> Some("JP")))
  }

  test("geoEnrich resolves ranges spanning multiple /8 prefix buckets") {
    import spark.implicits._
    // range spans prefixes 0..2 with non-aligned edges
    val ranges = Seq((16777000L, 50331899L, "DE")).toDF("start", "end", "country")
    val df = Seq((1L, 16776999L), (2L, 16777000L), (3L, 33554432L), (4L, 50331900L))
      .toDF("id", "ip")
    val out = Ingest.geoEnrich(df, "ip", ranges)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("country"))).toMap
    assert(out == Map(1L -> None, 2L -> Some("DE"), 3L -> Some("DE"), 4L -> None))
  }

  test("geoEnrich drops the broadcast hint above the exploded-row threshold") {
    import spark.implicits._
    // 40 ranges, each spanning 2 full /8 buckets → 120 exploded rows
    val ranges = (0 until 40).map { i =>
      val start = i * 3L * 16777216L
      (start, start + 2L * 16777216L - 1L, s"C$i")
    }.toDF("start", "end", "country")
    val df = (0 until 40).map(i => (i.toLong, i * 3L * 16777216L + 5L))
      .toDF("id", "ip")
    val broad = Ingest.geoEnrich(df, "ip", ranges)
    val shuffled = Ingest.geoEnrich(df, "ip", ranges, maxBroadcastBytes = 10L)
    // the gate drops the hint (AQE may still pick its own strategy at
    // runtime — the point is we stop FORCING hundreds of MB resident)
    assert(broad.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!shuffled.queryExecution.analyzed.toString.contains("ResolvedHint"))
    def m(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("country"))).toMap
    assert(m(shuffled) == m(broad))
    assert(m(shuffled)(7L) == Some("C7"))
  }

  test("geoEnrich broadcasts derived frames with sentinel stats via the row-count gate") {
    import spark.implicits._
    val src = Seq((100L, 199L, "US"), (300L, 399L, "JP"))
      .toDF("start", "end", "country")
    // an RDD round-trip loses Catalyst stats: the plan reports the
    // defaultSizeInBytes sentinel, which must NOT silently lose the
    // broadcast hint for a 2-row table
    val derived = spark.createDataFrame(src.rdd, src.schema)
    assert(derived.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(Long.MaxValue) / 2, "fixture must actually have sentinel stats")
    val df = Seq((1L, 150L), (2L, 250L)).toDF("id", "ip")
    val out = Ingest.geoEnrich(df, "ip", derived)
    assert(out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "sentinel stats fall back to the row-count gate, keeping the hint")
    assert(out.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("country")))
      .toMap == Map(1L -> Some("US"), 2L -> None))
    // a budget too small for even one ~64B row still drops the hint
    val big = Ingest.geoEnrich(df, "ip", derived, maxBroadcastBytes = 63L)
    assert(!big.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  test("geoEnrich construction fires no Spark job (gate reads plan stats)") {
    import spark.implicits._
    val ranges = Seq((100L, 199L, "US")).toDF("start", "end", "country")
    val df = Seq((1L, 150L)).toDF("id", "ip")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Ingest.geoEnrich(df, "ip", ranges)
      // listener delivery is async; a .first() inside geoEnrich would
      // have blocked until its job ran, so a short drain suffices
      Thread.sleep(500)
      assert(jobs == 0,
        "building the geoEnrich plan must not run a Spark job when the " +
          "ranges frame has real stats (every streaming micro-batch " +
          "constructs it; only the sentinel-stats fallback may count)")
      assert(out.collect().map(_.getAs[String]("country")).toSeq == Seq("US"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("identifyBatch bumps versions per update, last-set wins, nulls don't overwrite") {
    import spark.implicits._
    val profiles = Seq(("u1", 3L, Some("basic"), Some("view")))
      .toDF("user_key", "version", "plan", "last_event")
    val updates = Seq(
      ("u1", 10L, None: Option[String], Some("click")),
      ("u1", 11L, Some("pro"), Some("buy")),
      ("u1", 12L, None: Option[String], Some("view")),
      ("u2", 13L, None: Option[String], Some("signup")))
      .toDF("user_key", "seq", "plan", "last_event")
    val out = Ingest.identifyBatch(profiles, updates, Seq("plan", "last_event"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2)), r.getString(3)))).toMap
    // u1: 3 base + 3 updates; plan stays "pro" (nulls at seq 10/12 don't
    // overwrite); last_event = value at max seq. u2 enters at version 1
    // with no plan ever set.
    assert(out("u1") == ((6L, Some("pro"), "view")))
    assert(out("u2") == ((1L, None, "signup")))
  }

  test("streamingTrack resolves ids across micro-batches via the persisted snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ranges = Seq((0L, 1000L, "US")).toDF("start", "end", "country")
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val input = MemoryStream[(String, Long, String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    val q = Ingest.streamingTrack(
      input.toDF().toDF("user_key", "seq", "ua", "ip"),
      s"$dir/ids", ranges) { (denorm, _) =>
        seen ++= denorm.select("user_key", "resolved_user_id", "country")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      }
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(("b", 2L, "curl/8", 5L), ("a", 1L, "curl/8", 7L))
      q.processAllAvailable()
      // batch 1: unseen keys ranked by first-seen seq -> a=1, b=2
      input.addData(("a", 3L, "curl/8", 9L), ("c", 4L, "curl/8", 2000L))
      q.processAllAvailable()
      // batch 2: a keeps its snapshot id; c continues numbering at 3
      val byKey = seen.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      assert(byKey("a") == Seq(1L), "same user resolves to the same id across batches")
      assert(byKey("b") == Seq(2L))
      assert(byKey("c") == Seq(3L))
      // geo enrichment applied per batch; ip 2000 is outside every range
      assert(seen.collect { case ("c", _, country) => country } == Seq(null))
      val snap = Ingest.loadSnapshot(spark, s"$dir/ids")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(snap == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    } finally q.stop()
  }

  test("sessionize splits on the inactivity gap; sessionEnds summarizes per session") {
    import spark.implicits._
    // user 1: events at 0, 50, 200 (gap 100 → sessions [0,50] and [200]);
    // user 2: single event; tie at t=50 stays in-session
    val ev = Seq((1L, 0L), (1L, 50L), (1L, 50L), (1L, 200L), (2L, 10L))
      .toDF("user_id", "ts_us")
    val s = Ingest.sessionize(ev, "user_id", "ts_us", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s((1L, 0L)) == 1L && s((1L, 50L)) == 1L && s((1L, 200L)) == 2L)
    assert(s((2L, 10L)) == 1L, "first session is 1-based like the reference counter")
    val ends = Ingest.sessionEnds(ev, "user_id", "ts_us", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(ends((1L, 1L)) == ((0L, 50L, 3L)))
    assert(ends((1L, 2L)) == ((200L, 200L, 1L)))
    assert(ends((2L, 1L)) == ((10L, 10L, 1L)))
  }

  test("identifyBatch keeps untouched profiles as-is") {
    import spark.implicits._
    val profiles = Seq(("u1", 2L, Some("basic"))).toDF("user_key", "version", "plan")
    val updates = Seq.empty[(String, Long, Option[String])].toDF("user_key", "seq", "plan")
    val out = Ingest.identifyBatch(profiles, updates, Seq("plan")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L && out(0).getString(2) == "basic")
  }

  test("quality gates: ordered reasons, null-fails, both channels idempotent") {
    import spark.implicits._
    import graft.ingest.Quality
    val dir = java.nio.file.Files.createTempDirectory("graft-qual").toString
    val checks = Seq(
      Quality.Check("pos", col("v") > 0),
      Quality.Check("small", col("v") < 100))
    val rows = Seq(("a", Some(5L)), ("b", Some(-3L)), ("c", Some(500L)),
      ("d", None), ("e", Some(50L))).toDF("k", "v")
    val (good, bad) = Quality.split(rows, checks)
    assert(good.collect().map(_.getString(0)).toSet == Set("a", "e"))
    val reasons = bad.collect()
      .map(r => r.getString(0) -> r.getAs[String]("reasons")).toMap
    // declaration-ordered reasons; NULL fails every check it reaches
    assert(reasons == Map("b" -> "pos", "c" -> "small", "d" -> "pos,small"),
      s"got $reasons")
    // gated append: replay is a no-op in BOTH channels
    assert(Quality.appendChecked(rows, dir, "b0", checks) == ((true, true)))
    assert(Quality.appendChecked(rows, dir, "b0", checks) == ((false, false)))
    assert(spark.read.parquet(dir).count() == 2)
    assert(Quality.quarantine(spark, dir).count() == 3)
    // the quarantine sibling is invisible to plain store readers
    assert(spark.read.parquet(dir).columns.toSet == Set("k", "v"))
  }
}
