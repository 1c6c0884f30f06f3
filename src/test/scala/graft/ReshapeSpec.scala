package graft

import graft.engine.{Records, Reshape}
import graft.model.TimeIntervalUnit
import org.apache.spark.sql.functions._

class ReshapeSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("timeColumns covers the range inclusive, week starts Monday") {
    val days = Reshape.timeColumns(ts("2024-01-05T07:00:00Z"), ts("2024-01-07T01:00:00Z"),
      TimeIntervalUnit.Day)
    assert(days.map(_.toInstant.toString) == Seq(
      "2024-01-05T00:00:00Z", "2024-01-06T00:00:00Z", "2024-01-07T00:00:00Z"))
    // 2024-01-05 is a Friday; its week bucket starts Monday 2024-01-01
    val weeks = Reshape.timeColumns(ts("2024-01-05T07:00:00Z"), ts("2024-01-09T00:00:00Z"),
      TimeIntervalUnit.Week)
    assert(weeks.map(_.toInstant.toString) == Seq(
      "2024-01-01T00:00:00Z", "2024-01-08T00:00:00Z"))
  }

  test("pivot produces a column per precomputed bucket, empty cells null") {
    import spark.implicits._
    val long = Seq(("a", "d1", 5L), ("b", "d2", 7L)).toDF("g", "d", "v")
    val out = Reshape.pivot(long, Seq("g"), "d", Seq("d1", "d2", "d3"), "v")
    assert(out.columns.toSeq == Seq("g", "d1", "d2", "d3"))
    val rows = out.collect().map(r => r.getString(0) ->
      (0 to 2).map(i => Option(r.get(i + 1))).toSeq).toMap
    assert(rows("a") == Seq(Some(5L), None, None))
    assert(rows("b") == Seq(None, Some(7L), None))
  }

  test("unpivot melts metric columns to long form as double") {
    import spark.implicits._
    val wide = Seq(("a", 1L, 2.5)).toDF("g", "cnt", "s")
    val out = Reshape.unpivot(wide, Seq("g"), Seq("cnt", "s"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(out == Map("cnt" -> 1.0, "s" -> 2.5))
  }

  test("renameColumns dedups display names as 'Name 2'") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val out = Reshape.renameColumns(df, Seq("a" -> "Name", "b" -> "Name", "c" -> "Other"))
    assert(out.columns.toSeq == Seq("Name", "Name 2", "Other"))
  }

  test("renameColumnRows rewrites values through a when-chain") {
    import spark.implicits._
    val df = Seq("0_0_count", "other").toDF("m")
    val out = Reshape.renameColumnRows(df, "m", Map("0_0_count" -> "Count"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Count", "other"))
  }

  test("aggregateAndSortColumns appends row average and sorts desc") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 3.0), ("b", 10.0, 20.0)).toDF("g", "m1", "m2")
    val out = Reshape.aggregateAndSortColumns(df, Seq("m1", "m2"))
      .collect().map(r => (r.getString(0), r.getAs[Double]("average"))).toSeq
    assert(out == Seq(("b", 15.0), ("a", 2.0)))
  }

  test("limitGroups keeps top-k group tuples by order column") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 9L), ("b", 5L), ("c", 7L), ("d", 2L))
      .toDF("g", "cnt")
    val kept = Reshape.limitGroups(df, Seq("g"), "cnt", 2)
      .select("g").distinct().collect().map(_.getString(0)).toSet
    assert(kept == Set("a", "c")) // max cnt: a=9, c=7, b=5, d=2
  }

  test("merge unions with tag column and missing columns null") {
    import spark.implicits._
    val l = Seq((1L, 2.0)).toDF("k", "x")
    val r = Seq((2L, "z")).toDF("k", "y")
    val out = Reshape.merge(Seq("L" -> l, "R" -> r), Some("tag"))
    assert(out.columns.toSet == Set("k", "x", "y", "tag"))
    val rows = out.collect().map(r => r.getAs[String]("tag") -> r).toMap
    assert(rows("L").getAs[Any]("y") == null)
    assert(rows("R").getAs[Any]("x") == null)
  }

  test("latestPerGroup picks highest version per id") {
    import spark.implicits._
    val df = Seq((1L, 1L, "old"), (1L, 5L, "new"), (2L, 2L, "only"))
      .toDF("id", "version", "payload")
    val out = Records.latestPerGroup(df, "id", "version")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "new", 2L -> "only"))
  }

  test("columnar response serializer tags and rounds like the reference") {
    import spark.implicits._
    val df = Seq(("click", 3L, 1.23456), ("view", 2L, 2.0))
      .toDF("event_type", "cnt", "avg_v")
    val table = graft.engine.Response.collect(df)
    val byName = table.columns.map(c => c.name -> c).toMap
    assert(byName("event_type").kind == graft.engine.Response.Dimension)
    assert(byName("cnt").kind == graft.engine.Response.Metric)
    assert(byName("avg_v").values.toSet == Set("1.235", "2")) // 3 digits, zeros trimmed
    assert(table.toJson.contains(""""name":"cnt","kind":"Metric""""))
  }

  test("funnel nested response matches the reference shape with 3-digit rounding") {
    import org.apache.spark.sql.functions._
    val h = 3600 * 1000L
    val df = eventsDf(Seq(
      (1L, 0L, "view", "ios", 0.0), (1L, h, "click", "ios", 0.0),
      (2L, 0L, "view", "and", 0.0), (2L, h, "click", "and", 0.0),
      (3L, 0L, "view", "ios", 0.0)))
    val long = graft.engine.Funnel.run(spark, df, graft.engine.Funnel.Request(
      steps = Seq(col("event_type") === "view", col("event_type") === "click"),
      windowMs = 24 * h, breakdowns = Seq("device")))
    val resp = graft.engine.Response.funnelResponse(long,
      Seq("view", "click"), breakdowns = Seq("device"))
    assert(resp.groups == Seq("device"))
    assert(resp.steps.map(_.step) == Seq("view", "click"))
    val viewData = resp.steps.head.data.map(d => d.groups.get.head -> d.total).toMap
    assert(viewData == Map("ios" -> 2L, "and" -> 1L))
    val clickIos = resp.steps(1).data.find(_.groups.get.head == "ios").get
    assert(clickIos.total == 1L)
    assert(clickIos.conversionRatio == "50") // 3 digits, zeros trimmed
    val json = resp.toJson
    assert(json.startsWith("""{"groups":["device"],"steps":[{"step":"view""""))
    assert(json.contains(""""conversionRatio":"50""""))
  }

  test("CSV source reads with an explicit schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f, "id,name,v\n1,a,1.5\n2,b,2.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val df = graft.engine.Tables.loadCsv(spark, f.toString, schema)
    assert(df.schema == schema)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).collect()(0).getDouble(0) == 4.0)
  }

  test("addStringColumn and reorderColumns") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Reshape.reorderColumns(
      Reshape.addStringColumn(df, "tag", "x"), Seq("b"))
    assert(out.columns.toSeq == Seq("b", "tag", "a"))
  }
}
