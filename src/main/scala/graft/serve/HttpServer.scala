package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.engine.{JsonApi, Metrics, Response}
import graft.model.Json
import graft.model.Json._
import graft.model.{CustomEvent, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin JDK-only HTTP transport over [[graft.engine.JsonApi]] — the
  * analog of the reference's axum router (reference
  * platform/src/http/mod.rs; route shapes from
  * platform/src/http/event_segmentation.rs:31-40, funnel.rs:32,
  * event_records.rs, properties.rs, group_records.rs, reports.rs
  * :201-216). Like the reference, every route nests under
  * `/api/v1/projects/:project_id/…` and the path's project id scopes
  * the request: it is injected into the JSON body (unless the body
  * already pins one) so the engine's tenant filter applies, and the
  * report/dashboard registries are consulted project-first.
  *
  * The handler does parse → [[Metrics.timed]] → JsonApi → JSON
  * response, nothing else — all real work stays in the engine, so a
  * body POSTed here returns byte-identical output to calling JsonApi
  * directly. `com.sun.net.httpserver` ships in the JDK (no new
  * dependency); this transport is a driver-side front door, the data
  * path behind it is the same distributed Spark plan either way.
  *
  * Routes:
  *  - POST queries/event-segmentation   → columnar JSON
  *  - POST queries/funnel               → nested funnel JSON
  *  - POST event-records/search         → columnar JSON
  *  - POST properties/values            → columnar JSON
  *  - POST group-records/search         → columnar JSON
  *  - POST/GET reports, GET/DELETE reports/:id, POST reports/:id/run
  *  - POST dashboards, POST dashboards/:id/run
  */
final class GraftHttpServer(
    spark: SparkSession,
    events: DataFrame,
    reports: graft.model.Reports = new graft.model.Reports,
    registry: Registry = Registry.open,
    customEvents: Map[Long, CustomEvent] = Map.empty,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val server = HttpServer.create(new InetSocketAddress(0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def start(): GraftHttpServer = { server.start(); this }
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)

  private val ProjectPath = "/api/v1/projects/([0-9]+)(/.*)".r

  private def handle(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val (status, json) =
      try {
        ex.getRequestURI.getPath match {
          case ProjectPath(pid, rest) =>
            route(ex.getRequestMethod, pid.toLong,
              rest.split("/").filter(_.nonEmpty).toList, body)
          case _ => 404 -> err("not found")
        }
      } catch {
        case e: Json.JsonError          => 400 -> err(e.message)
        case e: IllegalArgumentException => 400 -> err(e.getMessage)
        case e: RuntimeException
          if e.getMessage != null && e.getMessage.contains("not found") =>
          404 -> err(e.getMessage)
      }
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def route(method: String, pid: Long, segs: List[String],
                    body: String): (Int, String) = (method, segs) match {
    case ("POST", List("queries", "event-segmentation")) =>
      200 -> Metrics.timed("event_segmentation") {
        Response.collect(JsonApi.eventSegmentation(
          events, withProject(body, pid), customEvents, registry)).toJson
      }
    case ("POST", List("queries", "funnel")) =>
      200 -> JsonApi.funnelJson(spark, events, withProject(body, pid), registry)
    case ("POST", List("event-records", "search")) =>
      200 -> Metrics.timed("event_records_search") {
        Response.collect(JsonApi.eventRecordsSearch(
          events, withProject(body, pid), registry)).toJson
      }
    case ("POST", List("properties", "values")) =>
      200 -> Metrics.timed("property_values") {
        Response.collect(JsonApi.propertyValues(
          events, withProject(body, pid), registry)).toJson
      }
    case ("POST", List("group-records", "search")) =>
      200 -> Metrics.timed("group_records_search") {
        Response.collect(JsonApi.groupRecordsSearch(
          events, withProject(body, pid), registry)).toJson
      }

    case ("POST", List("reports")) =>
      val j = Json.parse(body)
      val r = reports.create(pid, (j / "name").str, (j / "type").str,
        (j / "query").render, clock(),
        tags = j.asOpt("tags").map(_.arr.map(_.str)).getOrElse(Nil),
        description = j.asOpt("description").map(_.str))
      200 -> reportJson(r)
    case ("GET", List("reports")) =>
      200 -> reports.list(pid).map(reportJson).mkString("[", ",", "]")
    case ("GET", List("reports", IdSeg(id))) =>
      reports.get(pid, id).map(r => 200 -> reportJson(r))
        .getOrElse(404 -> err(s"report $id not found"))
    case ("DELETE", List("reports", IdSeg(id))) =>
      reports.delete(pid, id); 200 -> "{}"
    case ("POST", List("reports", IdSeg(id), "run")) =>
      reports.get(pid, id)
        .map { r =>
          200 -> Metrics.timed("report_run") {
            Response.collect(
              JsonApi.runReport(spark, events, r, customEvents, registry)).toJson
          }
        }
        .getOrElse(404 -> err(s"report $id not found"))

    case ("POST", List("dashboards")) =>
      val j = Json.parse(body)
      val panels = (j / "panels").arr.map { p =>
        graft.model.Panel((p / "reportId").long,
          p.asOpt("x").map(_.int).getOrElse(0), p.asOpt("y").map(_.int).getOrElse(0),
          p.asOpt("w").map(_.int).getOrElse(1), p.asOpt("h").map(_.int).getOrElse(1))
      }
      val d = reports.createDashboard(pid, (j / "name").str, panels, clock())
      200 -> s"""{"id":${d.id},"projectId":${d.projectId},"name":${JStr(d.name).render},"panels":${panels.map(p => s"""{"reportId":${p.reportId},"x":${p.x},"y":${p.y},"w":${p.w},"h":${p.h}}""").mkString("[", ",", "]")}}"""
    case ("POST", List("dashboards", IdSeg(id), "run")) =>
      reports.getDashboard(pid, id)
        .map { d =>
          val results = JsonApi.runDashboard(spark, events, d, reports,
            customEvents, registry)
          200 -> results.map { case (p, df) =>
            s"""{"reportId":${p.reportId},"result":${Response.collect(df).toJson}}"""
          }.mkString("""{"panels":[""", ",", "]}")
        }
        .getOrElse(404 -> err(s"dashboard $id not found"))

    case _ => 404 -> err("not found")
  }

  /** The reference carries the tenant in the URL path
    * (platform/src/http/event_segmentation.rs:31 `:project_id`); a
    * body that doesn't pin `projectId` inherits the path's. */
  private def withProject(body: String, pid: Long): String =
    Json.parse(body) match {
      case JObj(fs) if !fs.exists(_._1 == "projectId") =>
        JObj(fs :+ ("projectId" -> JNum(pid.toDouble))).render
      case _ => body
    }

  private object IdSeg {
    def unapply(s: String): Option[Long] =
      try Some(s.toLong) catch { case _: NumberFormatException => None }
  }

  private def err(msg: String): String =
    s"""{"error":${JStr(if (msg == null) "error" else msg).render}}"""

  private def reportJson(r: graft.model.Report): String = {
    val tags = r.tags.map(t => JStr(t).render).mkString("[", ",", "]")
    val desc = r.description.map(d => JStr(d).render).getOrElse("null")
    s"""{"id":${r.id},"projectId":${r.projectId},"name":${JStr(r.name).render},""" +
      s""""type":${JStr(r.typ).render},"query":${r.queryJson},"tags":$tags,""" +
      s""""description":$desc,"createdAt":${r.createdAt}}"""
  }
}
