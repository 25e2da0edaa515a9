package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan guardrails as a Catalyst optimizer rule (extension — SURVEY
  * §7.5): the scale-killer lint the test suite runs (PlanSpec) moved
  * into the session itself, so EVERY query — including ad-hoc SQL from
  * users of [[graft.GraftExtensions]] — is screened at plan time, not
  * in CI.
  *
  * Detected shapes, each the canonical way a correct-on-a-sample query
  * dies at 100 TB:
  *  - a Window with an empty PARTITION BY over a child of unknown or
  *    unbounded size: the whole input serializes onto ONE task. The
  *    engine's own bounded uses (dictionary ranking, bucket offsets —
  *    children capped at plan time via maxRows, SURVEY §4) stay silent.
  *  - a cross join whose sides are both unbounded: |L|×|R| rows.
  *    1-row scalar broadcasts (corpus totals) are bounded and pass.
  *
  * Modes via `spark.graft.guard`: `warn` (default) logs each finding
  * once per plan; `strict` throws [[ScaleKillerException]] — the mode a
  * production pipeline sets so a bad plan fails in seconds instead of
  * occupying a cluster for hours; `off` disables. The rule NEVER
  * rewrites the plan — it only inspects.
  */
object PlanGuard {

  final class ScaleKillerException(msg: String) extends RuntimeException(msg)

  /** A child is "bounded" when Catalyst can prove a small max row
    * count at plan time (literal locals, aggregates over literals,
    * LIMITs, 1-row global aggregates...).
    */
  private def bounded(p: LogicalPlan, cap: Long): Boolean =
    p.maxRows.exists(_ <= cap)

  /** True when any top-level conjunct is an equality with one side
    * referencing only left output and the other only right output —
    * the shape ExtractEquiJoinKeys turns into a hash join key.
    */
  private def hasEquiKey(j: Join): Boolean = {
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def splits(a: org.apache.spark.sql.catalyst.expressions.Expression,
        b: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut)) ||
        (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut))
    def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        conjunctsOf(a) ++ conjunctsOf(b)
      case other => Seq(other)
    }
    conjunctsOf(j.condition.get).exists {
      case EqualTo(a, b) => splits(a, b)
      case EqualNullSafe(a, b) => splits(a, b)
      case _ => false
    }
  }

  def findings(plan: LogicalPlan, boundedCap: Long = 1 << 20): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child, boundedCap) =>
        out += s"single-partition Window (no PARTITION BY) over an unbounded child: " +
          s"the whole input sorts on one task. Decompose the rank " +
          s"(bucket + per-bucket window + offsets, see graft.operators.Shuffle) " +
          s"or partition the window."
      case j: Join if j.joinType == Cross &&
          !bounded(j.left, boundedCap) && !bounded(j.right, boundedCap) =>
        out += s"cross join with both sides unbounded: |L|x|R| output. " +
          s"Broadcast a bounded side or rewrite with an equi-key " +
          s"(bucketed range join, see graft.operators.RangeJoin)."
      case j: Join if j.condition.isDefined && !hasEquiKey(j) &&
          !bounded(j.left, boundedCap) && !bounded(j.right, boundedCap) =>
        out += s"theta-only join (no equi-key spans both sides): Catalyst " +
          s"falls back to a nested-loop join, |L|x|R| compares. Bucket the " +
          s"range predicate into an equi-key (graft.operators.RangeJoin) or " +
          s"use the as-of operator (graft.operators.AsOf)."
      case _ =>
    }
    out.result()
  }
}

/** The injectable rule. Inspect-only: always returns `plan` unchanged. */
case class PlanGuardRule(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] with Logging {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode = spark.conf.get("spark.graft.guard", "warn")
    if (mode != "off") {
      val found = PlanGuard.findings(plan)
      if (found.nonEmpty) {
        val msg = s"[graft.guard] scale-killer plan shape(s):\n - " + found.mkString("\n - ")
        if (mode == "strict") throw new PlanGuard.ScaleKillerException(msg)
        else logWarning(msg)
      }
    }
    plan
  }
}
