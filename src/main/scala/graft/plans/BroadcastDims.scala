package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Catalyst optimizer rule: automatically broadcast-hint joins whose
  * build side is a known dimension table (SURVEY.md §4 "a Rule to
  * auto-inject … " — the one extension point the survey left optional).
  *
  * Why a rule instead of sprinkling `broadcast()` at call sites: the
  * set of *always-tiny* dimensions (region: 5 rows, nation: 25 — fixed
  * by the schema, independent of scale factor) is a property of the
  * DATA MODEL, not of any one query. Centralizing it means ad-hoc
  * queries (spark.sql over the registered views, notebook exploration)
  * get the same plan the curated operators get, even when the
  * size-estimate path would fall back to a sort-merge join (e.g. after
  * a selective filter whose stats Catalyst cannot see, or with
  * `autoBroadcastJoinThreshold` disabled for skew-safety).
  *
  * The rule only fills EMPTY hint slots — explicit user hints always
  * win — and only fires on scans of the named tables (optionally
  * wrapped in Project/Filter/SubqueryAlias), never on join outputs, so
  * it cannot broadcast an unbounded intermediate result. Registered via
  * [[graft.functions.GraftSessionExtensions]] (`injectOptimizerRule`)
  * or `spark.experimental.extraOptimizations`; both run before join
  * strategy selection, which reads the Join node's hint.
  */
case class BroadcastDims(dimFiles: Set[String]) extends Rule[LogicalPlan] {

  @tailrec
  private def base(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, c)       => base(c)
    case Filter(_, c)        => base(c)
    case SubqueryAlias(_, c) => base(c)
    case other               => other
  }

  private def isDim(p: LogicalPlan): Boolean = base(p) match {
    case r: LogicalRelation =>
      r.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(rp => dimFiles.contains(rp.getName))
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join =>
      val lh =
        if (j.hint.leftHint.isEmpty && isDim(j.left)) Some(HintInfo(Some(BROADCAST)))
        else j.hint.leftHint
      val rh =
        if (j.hint.rightHint.isEmpty && isDim(j.right)) Some(HintInfo(Some(BROADCAST)))
        else j.hint.rightHint
      if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }
}

object BroadcastDims {
  /** Schema-fixed tiny dimensions: row count is bounded by the data
    * model itself (geography), not the scale factor. */
  val defaultDims: Set[String] = Set("region.parquet", "nation.parquet")
}
