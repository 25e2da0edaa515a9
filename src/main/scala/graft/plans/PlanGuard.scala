package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LeafNode, LogicalPlan, SerializeFromObject, Window}
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
  *  - a Window whose PARTITION BY keys are all known LOW-CARDINALITY
  *    columns (lang/source/split — `spark.graft.guard.lowCardCols`)
  *    over a document-grain child: the moral equivalent of the empty
  *    partitionSpec — with ~10 groups at 100 TB each group is one
  *    multi-TB single-task sort. Children that are aggregates,
  *    object pipelines, prior windows, or provably bounded stay
  *    silent (see [[PlanGuard.findings]]'s docGrain).
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

  /** Column names that are LOW-CARDINALITY by this corpus's data model:
    * a handful of languages / sources / split labels, plus `cluster` —
    * a k-means cluster id is ≤ k values by construction, so a window
    * partitioned by it over corpus-grain rows puts ~N/k rows in ONE
    * task (the shape that hid in `Similarity.protoPrune` until round
    * 16; see its groupedRank spelling for the fix). Configurable per
    * session via `spark.graft.guard.lowCardCols` (comma-separated).
    */
  private[plans] val defaultLowCardCols =
    Set("lang", "source", "split", "cluster")

  /** Column names that carry PER-ROW IDENTITY in this corpus's data
    * model: grouping by one bounds the group at per-row content size
    * (the lines of one document, the chunks of one doc, the candidate
    * set of one query vector), so a `collect_list` under such a
    * grouping cannot grow with the corpus. `cluster_id`/`keep_id` (a
    * dedup cluster representative) is included deliberately: a cluster
    * IS its member list, the member list is the query's answer, and
    * the pathological case (a million-copy boilerplate cluster) is a
    * data-quality finding the skew suite measures rather than a plan
    * bug. Configurable via `spark.graft.guard.rowIdCols`.
    */
  private[plans] val defaultRowIdCols =
    Set("doc_id", "id", "id_a", "id_b", "q_id", "t_id", "vec_id",
      "user_id", "order_id", "o_orderkey", "l_orderkey", "event_id",
      "cluster_id", "keep_id", "__grp",
      // a chunk id is a bounded row-slice by construction (rank div k,
      // or doc_id div k — the Merkle-manifest and boundedMembers shapes)
      "chunk", "chunk_no")

  /** True when grouping expression `e` IS a row-id key: a bare
    * attribute whose name carries per-row identity, or an injective
    * per-row wrapper of one (Alias / Cast — same value space, renamed
    * or widened). Merely REFERENCING a row-id column does not qualify:
    * `groupBy(doc_id % 16)` references `doc_id` but each of its 16
    * groups is corpus-sized (N/16 rows) — exactly the manifest-style
    * shard grouping the silencer must NOT quiet. (A surjective
    * function of a row id is a bucketing, not an identity.)
    */
  private def isRowIdKey(e: Expression, rowIdCols: Set[String],
      defs: Map[Long, Expression]): Boolean = {
    def rec(ex: Expression, depth: Int): Boolean = ex match {
      case a: AttributeReference =>
        rowIdCols(a.name) ||
          // the optimizer pulls computed grouping keys into a Project
          // beneath the Aggregate (`_groupingexpression#N`); resolve
          // the attribute back to its defining alias and keep walking
          (depth < 8 && defs.get(a.exprId.id).exists(rec(_, depth + 1)))
      case al: Alias => rec(al.child, depth)
      case c: Cast => rec(c.child, depth)
      case _ => false
    }
    rec(e, 0)
  }

  /** exprId → defining expression for every Alias in Projects beneath
    * `p` (exprIds are plan-unique, so a flat map is unambiguous).
    */
  private def aliasDefs(p: LogicalPlan): Map[Long, Expression] =
    p.collect {
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        pr.projectList.collect { case al: Alias => al.exprId.id -> al.child }
    }.flatten.toMap

  private def hasCollect(e: Expression): Boolean = e.exists {
    case ae: AggregateExpression => ae.aggregateFunction match {
      case _: CollectList | _: CollectSet => true
      case _ => false
    }
    case _ => false
  }

  /** True when `p` still carries document-grain row count: the plan
    * reaches a leaf relation through only narrow row-preserving nodes.
    * Traversal STOPS (returns false) at the nodes that change grain or
    * impose prior structure:
    *  - a provably-bounded subtree (maxRows <= cap);
    *  - an Aggregate — output is group-grain, not row-grain;
    *  - SerializeFromObject — an object pipeline (e.g. the bounded-heap
    *    per-partition top-k pruner, graft.operators.Scale) already
    *    restructured the rows;
    *  - another Window — an earlier pass (typically a pruning rank +
    *    filter) imposed structure; the inner window is inspected on
    *    its own when the rule walks it.
    * Heuristic by design: a checkpointed bounded sample (LogicalRDD
    * leaf) is indistinguishable from a corpus scan and flags
    * conservatively — such sites carry an explicit justification in
    * the test-suite allowlist (PlanSpec).
    */
  private def docGrain(p: LogicalPlan, cap: Long): Boolean = p match {
    case _ if bounded(p, cap) => false
    case _: Aggregate => false
    case _: SerializeFromObject => false
    case _: Window => false
    case _: LeafNode => true
    case other => other.children.exists(c => docGrain(c, cap))
  }

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

  def findings(plan: LogicalPlan, boundedCap: Long = 1 << 20,
      lowCardCols: Set[String] = defaultLowCardCols,
      rowIdCols: Set[String] = defaultRowIdCols): Seq[String] = {
    val out = Seq.newBuilder[String]
    plan.foreach {
      // unbounded collect_list/collect_set: a per-key array that grows
      // with the corpus is ONE unspillable row — a degenerate key (a
      // million-copy boilerplate document in one LSH bucket) is a
      // multi-GB row and an executor OOM (the r15 SetJoin finding
      // class). Quiet only when a grouping key IS a per-row identity
      // (group size then bounded by per-row content). Note a post-agg
      // `slice(collect_list(x), 1, k)` does NOT bound anything: Spark
      // evaluates the slice in the result projection AFTER the
      // aggregate, so the agg buffer still materializes the entire
      // per-key array — the hot-key OOM this rule exists to catch.
      case a: Aggregate if a.aggregateExpressions.exists(hasCollect) &&
          !a.groupingExpressions.exists(
            isRowIdKey(_, rowIdCols, aliasDefs(a.child))) &&
          docGrain(a.child, boundedCap) =>
        val keys = a.groupingExpressions.flatMap(_.references.map(_.name))
          .distinct.mkString(", ")
        out += s"unbounded collect_list/collect_set grouped by ($keys) over a " +
          s"document-grain child: a hot key materializes its whole group in " +
          s"ONE unspillable row (multi-GB at 100x scale), and a post-agg " +
          s"slice/element_at wrapper does not shrink the agg buffer. Bound " +
          s"the BUFFER itself: rank then cap BEFORE collecting " +
          s"(graft.operators.TextDedup.boundedMembers splits each key's run " +
          s"into capped slices via a rank)."
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child, boundedCap) =>
        out += s"single-partition Window (no PARTITION BY) over an unbounded child: " +
          s"the whole input sorts on one task. Decompose the rank " +
          s"(bucket + per-bucket window + offsets, see graft.operators.Shuffle) " +
          s"or partition the window."
      case w: Window if w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall(e =>
            e.references.nonEmpty &&
              e.references.forall(a => lowCardCols(a.name))) &&
          docGrain(w.child, boundedCap) =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct.mkString(", ")
        out += s"low-cardinality Window partition ($keys) over a document-grain " +
          s"child: each group serializes onto ONE task (a multi-TB sort per " +
          s"$keys at 100x scale). Use graft.operators.Shuffle.groupedRank / " +
          s"groupedRunningSum (range-decomposed per-group rank/cumsum) or " +
          s"graft.operators.Scale.topKPerGroup (bounded-heap top-k) instead."
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
      val lowCard = spark.conf
        .get("spark.graft.guard.lowCardCols",
          PlanGuard.defaultLowCardCols.mkString(","))
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val rowId = spark.conf
        .get("spark.graft.guard.rowIdCols",
          PlanGuard.defaultRowIdCols.mkString(","))
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val found = PlanGuard.findings(plan, lowCardCols = lowCard,
        rowIdCols = rowId)
      if (found.nonEmpty) {
        val msg = s"[graft.guard] scale-killer plan shape(s):\n - " + found.mkString("\n - ")
        if (mode == "strict") throw new PlanGuard.ScaleKillerException(msg)
        else logWarning(msg)
      }
    }
    plan
  }
}
