package graft.model

import scala.collection.mutable

/** Saved reports, dashboards and bookmarks — the reference's stored
  * query surface (reference metadata/src/reports.rs:167-225
  * `Report { typ: EventSegmentation|Funnel, query }` with
  * created/updated bookkeeping, metadata/src/dashboards.rs:168-190
  * `Dashboard { panels }`, platform/src/bookmarks.rs:69-80; CRUD
  * routes platform/src/reports.rs:201-216).
  *
  * The reference keeps these in RocksDB; they are driver-side tiny
  * (named JSON query bodies), so here they live in a plain registry —
  * all the data-scale work happens when a report RUNS through
  * [[graft.engine.JsonApi.runReport]]. Timestamps are caller-supplied
  * so registries stay deterministic under test. */
object ReportType {
  val EventSegmentation = "eventSegmentation"
  val Funnel = "funnel"
  val all: Set[String] = Set(EventSegmentation, Funnel)
}

final case class Report(
    id: Long, projectId: Long, name: String,
    typ: String, queryJson: String,
    tags: Seq[String] = Nil, description: Option[String] = None,
    createdAt: Long = 0L, updatedAt: Option[Long] = None)

/** Dashboard panel: a report reference plus its grid placement
  * (reference dashboards.rs:168-178 Panel{type, report_id, x, y, w, h}). */
final case class Panel(reportId: Long, x: Int = 0, y: Int = 0, w: Int = 1, h: Int = 1)

final case class Dashboard(
    id: Long, projectId: Long, name: String, panels: Seq[Panel],
    createdAt: Long = 0L, updatedAt: Option[Long] = None)

/** Bookmark: an optionally-saved ad-hoc query a UI session can return
  * to (reference platform/src/bookmarks.rs:69-80). */
final case class Bookmark(id: Long, projectId: Long,
                          typ: String, queryJson: Option[String],
                          createdAt: Long = 0L)

final class Reports {
  private var nextReport = 0L
  private var nextDashboard = 0L
  private var nextBookmark = 0L
  private val reports = mutable.LinkedHashMap.empty[Long, Report]
  private val dashboards = mutable.LinkedHashMap.empty[Long, Dashboard]
  private val bookmarks = mutable.LinkedHashMap.empty[Long, Bookmark]

  def create(projectId: Long, name: String, typ: String, queryJson: String,
             now: Long, tags: Seq[String] = Nil,
             description: Option[String] = None): Report = {
    require(ReportType.all.contains(typ), s"unknown report type: $typ")
    nextReport += 1
    val r = Report(nextReport, projectId, name, typ, queryJson, tags,
      description, createdAt = now)
    reports(r.id) = r
    r
  }

  /** Partial update, reference UpdateReportRequest semantics: absent
    * fields keep their value; updatedAt records the edit. Like every
    * accessor here, scoped to the caller's project (the reference's
    * routes nest ids under /projects/:project_id — an id from another
    * tenant is "not found", never touched). */
  def update(projectId: Long, id: Long, now: Long, name: Option[String] = None,
             typ: Option[String] = None, queryJson: Option[String] = None,
             tags: Option[Seq[String]] = None): Report = {
    val cur = get(projectId, id).getOrElse(sys.error(s"report $id not found"))
    typ.foreach(t => require(ReportType.all.contains(t), s"unknown report type: $t"))
    val next = cur.copy(
      name = name.getOrElse(cur.name), typ = typ.getOrElse(cur.typ),
      queryJson = queryJson.getOrElse(cur.queryJson),
      tags = tags.getOrElse(cur.tags), updatedAt = Some(now))
    reports(id) = next
    next
  }

  def get(projectId: Long, id: Long): Option[Report] =
    reports.get(id).filter(_.projectId == projectId)
  def list(projectId: Long): Seq[Report] =
    reports.values.filter(_.projectId == projectId).toSeq

  /** Refuses to delete a report a dashboard still references —
    * createDashboard's referential check would otherwise be voided
    * the moment the report disappears. */
  def delete(projectId: Long, id: Long): Unit =
    get(projectId, id).foreach { _ =>
      val referencing = dashboards.values
        .filter(_.panels.exists(_.reportId == id)).map(_.id)
      require(referencing.isEmpty,
        s"report $id is referenced by dashboard(s) ${referencing.mkString(", ")}")
      reports.remove(id)
    }

  def createDashboard(projectId: Long, name: String, panels: Seq[Panel],
                      now: Long): Dashboard = {
    panels.foreach(p => require(get(projectId, p.reportId).isDefined,
      s"panel references unknown report ${p.reportId}"))
    nextDashboard += 1
    val d = Dashboard(nextDashboard, projectId, name, panels, createdAt = now)
    dashboards(d.id) = d
    d
  }
  def getDashboard(projectId: Long, id: Long): Option[Dashboard] =
    dashboards.get(id).filter(_.projectId == projectId)
  def listDashboards(projectId: Long): Seq[Dashboard] =
    dashboards.values.filter(_.projectId == projectId).toSeq
  def deleteDashboard(projectId: Long, id: Long): Unit =
    getDashboard(projectId, id).foreach(_ => dashboards.remove(id))

  /** Partial dashboard update (reference dashboards.rs update route —
    * UpdateDashboardRequest's optional name/panels): absent fields
    * keep their value; replacement panels re-run the same referential
    * check as creation. */
  def updateDashboard(projectId: Long, id: Long, now: Long,
                      name: Option[String] = None,
                      panels: Option[Seq[Panel]] = None): Dashboard = {
    val cur = getDashboard(projectId, id)
      .getOrElse(sys.error(s"dashboard $id not found"))
    panels.foreach(_.foreach(p => require(get(projectId, p.reportId).isDefined,
      s"panel references unknown report ${p.reportId}")))
    val next = cur.copy(name = name.getOrElse(cur.name),
      panels = panels.getOrElse(cur.panels), updatedAt = Some(now))
    dashboards(id) = next
    next
  }

  def createBookmark(projectId: Long, typ: String, queryJson: Option[String],
                     now: Long): Bookmark = {
    nextBookmark += 1
    val b = Bookmark(nextBookmark, projectId, typ, queryJson, createdAt = now)
    bookmarks(b.id) = b
    b
  }
  def getBookmark(projectId: Long, id: Long): Option[Bookmark] =
    bookmarks.get(id).filter(_.projectId == projectId)
}
