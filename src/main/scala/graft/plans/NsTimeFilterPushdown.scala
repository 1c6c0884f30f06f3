package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst rule: make time-range filters on nanosecond-long event
  * timestamps parquet-pushable.
  *
  * The driver's events table stores TIMESTAMP(NANOS), which we read as
  * a raw ns BIGINT and floor-convert with
  * `timestamp_micros(ts div 1000)` (graft.engine.Tables.events). A
  * predicate on that derived expression cannot reach the parquet
  * reader — `PushedFilters` shows only `IsNotNull`, so every query
  * would scan the full table at 100 TB.
  *
  * The conversion is monotonic, so each comparison against a literal
  * has an exact equivalent on the raw column (with µs→ns boundary
  * adjustment on the inclusive side):
  *
  *   micros(a div 1000) >= T  ⇔  a >= us(T)*1000
  *   micros(a div 1000) >  T  ⇔  a >  us(T)*1000 + 999
  *   micros(a div 1000) <= T  ⇔  a <= us(T)*1000 + 999
  *   micros(a div 1000) <  T  ⇔  a <  us(T)*1000
  *
  * The rule ADDS the raw-column conjunct next to the original
  * predicate (semantically implied, so results are unchanged); the
  * data source then prunes row groups / pages on the raw long stats.
  * Registered idempotently via `spark.experimental.extraOptimizations`
  * in Tables.events — no session-construction control needed.
  */
object NsTimeFilterPushdown extends Rule[LogicalPlan] {

  /** a `timestamp_micros(attr div 1000)` subtree → the raw attr. */
  private def nsAttr(e: Expression): Option[Attribute] = e match {
    case MicrosToTimestamp(IntegralDivide(a: Attribute, Literal(1000L, LongType), _))
        if a.dataType == LongType => Some(a)
    case _ => None
  }

  private def usOf(l: Literal): Option[Long] = l match {
    case Literal(v: Long, TimestampType) => Some(v) // internal value is epoch µs
    case _ => None
  }

  /** Raw-long conjunct implied by one comparison, if it matches. */
  private def rawConjunct(p: Expression): Option[Expression] = p match {
    case GreaterThanOrEqual(e, lit: Literal) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield GreaterThanOrEqual(a, Literal(us * 1000L))
    case GreaterThan(e, lit: Literal) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield GreaterThan(a, Literal(us * 1000L + 999L))
    case LessThanOrEqual(e, lit: Literal) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield LessThanOrEqual(a, Literal(us * 1000L + 999L))
    case LessThan(e, lit: Literal) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield LessThan(a, Literal(us * 1000L))
    // mirrored literal-first forms
    case GreaterThanOrEqual(lit: Literal, e) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield LessThanOrEqual(a, Literal(us * 1000L + 999L))
    case LessThanOrEqual(lit: Literal, e) =>
      for (a <- nsAttr(e); us <- usOf(lit)) yield GreaterThanOrEqual(a, Literal(us * 1000L))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(rawConjunct)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .distinct
      if (extras.isEmpty) f
      else Filter((conjuncts ++ extras).reduce(And), child)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other     => other :: Nil
    }
}
