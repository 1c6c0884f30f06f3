package graft.engine

import org.apache.spark.sql.DataFrame

/** Column-oriented result serialization — the Spark analog of the
  * reference's `ColumnarDataTable` (query/src/lib.rs:366-385) that the
  * HTTP layer renders as JSON columns tagged Dimension/Metric by
  * time-column membership (platform/src/event_segmentation.rs:80-92;
  * tagging rule event_segmentation.rs:136-162).
  *
  * Display values follow the reference's presentation rounding:
  * decimals shown with at most ROUND_DIGITS=3 digits, trailing zeros
  * trimmed (common/src/types.rs:17; funnel.rs:140-150).
  */
object Response {

  sealed trait ColumnKind
  case object Dimension extends ColumnKind
  case object Metric extends ColumnKind

  final case class ResponseColumn(name: String, kind: ColumnKind, values: Seq[String])
  final case class ColumnarTable(columns: Seq[ResponseColumn]) {
    /** Result rows (every column carries one value per row). */
    def rowCount: Long = columns.headOption.map(_.values.size.toLong).getOrElse(0L)
    def toJson: String = columns.map { c =>
      val vals = c.values.map(v =>
        if (v == null) "null" else "\"" + escape(v) + "\"")
        .mkString("[", ",", "]")
      s"""{"name":"${escape(c.name)}","kind":"${c.kind}","values":$vals}"""
    }.mkString("""{"columns":[""", ",", "]}")
  }

  /** Full JSON string escaping — backslash, quote, and all control
    * characters (U+0000–U+001F), per RFC 8259. */
  private[engine] def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Reference presentation rounding: ≤3 digits, trailing zeros
    * trimmed ("1.500" → "1.5", "2.000" → "2"). */
  private[engine] def formatNumber(d: Double): String = {
    val r = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val s = r.bigDecimal.stripTrailingZeros.toPlainString
    if (s == "-0") "0" else s
  }

  private def fmt(v: Any): String = v match {
    case null                => null
    case d: java.lang.Double => formatNumber(d)
    case f: java.lang.Float  => formatNumber(f.toDouble)
    case b: java.math.BigDecimal => formatNumber(b.doubleValue())
    case other               => other.toString
  }

  // ---------------------------------------------------------------
  // Funnel nested response (reference query/src/funnel.rs:98-248:
  // wide per-step columns reshaped into Response{groups,
  // steps:[Step{step, data:[StepData…]}]} with ROUND_DIGITS=3
  // presentation rounding). Our engine's long-form frame (one row per
  // (bucket, breakdowns, step)) regroups by step instead of slicing
  // wide columns; values are identical.
  // ---------------------------------------------------------------

  final case class StepData(
      groups: Option[Seq[String]], ts: Long, total: Long,
      conversionRatio: String, avgTimeToConvert: String,
      avgTimeToConvertFromStart: String, droppedOff: Long,
      dropOffRatio: String, timeToConvert: Long, timeToConvertFromStart: Long)
  final case class FunnelStep(step: String, data: Seq[StepData])
  final case class FunnelResponse(groups: Seq[String], steps: Seq[FunnelStep]) {
    def toJson: String = {
      def stepJson(s: FunnelStep): String = {
        val data = s.data.map { d =>
          val g = d.groups.fold("")(gs =>
            "\"groups\":" + gs.map(v => "\"" + escape(v) + "\"").mkString("[", ",", "]") + ",")
          s"""{$g"ts":${d.ts},"total":${d.total},"conversionRatio":"${d.conversionRatio}",""" +
            s""""avgTimeToConvert":"${d.avgTimeToConvert}","avgTimeToConvertFromStart":"${d.avgTimeToConvertFromStart}",""" +
            s""""droppedOff":${d.droppedOff},"dropOffRatio":"${d.dropOffRatio}",""" +
            s""""timeToConvert":${d.timeToConvert},"timeToConvertFromStart":${d.timeToConvertFromStart}}"""
        }.mkString("[", ",", "]")
        s"""{"step":"${escape(s.step)}","data":$data}"""
      }
      s"""{"groups":${groups.map(g => "\"" + escape(g) + "\"").mkString("[", ",", "]")},""" +
        s""""steps":${steps.map(stepJson).mkString("[", ",", "]")}}"""
    }
  }

  /** Reshape [[Funnel.run]]'s long-form result (small: steps ×
    * buckets × breakdowns rows) into the reference's nested funnel
    * response. `stepNames` label the steps 1..n; group labels are the
    * breakdown values (the reference prepends the segment name —
    * our engine filters to the segment instead of labeling it). */
  def funnelResponse(df: DataFrame, stepNames: Seq[String],
                     breakdowns: Seq[String] = Nil): FunnelResponse = {
    val hasBucket = df.columns.contains("bucket")
    val rows = df.collect().toSeq
    val steps = stepNames.zipWithIndex.map { case (name, i) =>
      val stepRows = rows.filter(_.getAs[Int]("step") == i + 1)
      val data = stepRows.map { r =>
        val groups =
          if (breakdowns.isEmpty) None
          else Some(breakdowns.map(b => String.valueOf(r.getAs[Any](b))))
        StepData(
          groups = groups,
          ts = if (hasBucket) r.getAs[java.sql.Timestamp]("bucket").getTime else 0L,
          total = r.getAs[Long]("total"),
          conversionRatio = formatNumber(r.getAs[Double]("conversion_ratio")),
          avgTimeToConvert = formatNumber(r.getAs[Double]("avg_time_to_convert")),
          avgTimeToConvertFromStart = formatNumber(r.getAs[Double]("avg_time_to_convert_from_start")),
          droppedOff = r.getAs[Long]("dropped_off"),
          dropOffRatio = formatNumber(r.getAs[Double]("drop_off_ratio")),
          timeToConvert = r.getAs[Long]("time_to_convert"),
          timeToConvertFromStart = r.getAs[Long]("time_to_convert_from_start"))
      }
      FunnelStep(name, data)
    }
    FunnelResponse(breakdowns, steps)
  }

  /** Collect a (small, post-aggregation) result into the columnar
    * response shape. `metricCols` default: numeric columns are
    * metrics, everything else a dimension — the reference tags by
    * time-column names; callers with pivoted output pass the bucket
    * column names explicitly. */
  def collect(df: DataFrame, metricCols: Seq[String] = Nil): ColumnarTable = {
    val rows = df.collect()
    val isMetric: String => Boolean =
      if (metricCols.nonEmpty) metricCols.contains
      else {
        val numeric = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
        }.toSet
        numeric.contains
      }
    val cols = df.columns.zipWithIndex.map { case (name, i) =>
      ResponseColumn(name,
        if (isMetric(name)) Metric else Dimension,
        rows.toSeq.map(r => fmt(r.get(i))))
    }
    ColumnarTable(cols.toSeq)
  }
}
