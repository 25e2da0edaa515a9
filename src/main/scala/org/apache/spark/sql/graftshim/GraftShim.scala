package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversion.
  *
  * Spark 4 made `Column` implementation-agnostic (it wraps a ColumnNode);
  * turning a raw Catalyst `Expression` into a `Column` goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim lives under `org.apache.spark.sql` purely to
  * re-export those two conversions for graft's native expressions —
  * the standard extension-library pattern.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion: `expression` wraps the node
    * lazily (ColumnNodeExpression), which only resolves when the
    * surrounding DataFrame machinery runs the converter — inside an
    * injected FunctionBuilder the analyzer sees the opaque wrapper and
    * fails with VOID. This runs the classic converter immediately,
    * yielding plain (unresolved) Catalyst expressions the analyzer
    * handles like any parsed SQL.
    */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** `Dataset.ofRows` for custom logical plans (private[sql] in Spark):
    * the entry point graft's custom operators use to hand a hand-built
    * [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] node
    * back to the planner.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The ANALYZED logical plan of a DataFrame — resolved attributes
    * with stable exprIds, ready to embed as a child of a custom node.
    */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** `localCheckpoint` that RESETS plan statistics. Spark's own
    * `Dataset.localCheckpoint` carries the pre-checkpoint plan's
    * estimated statistics into the resulting LogicalRDD (`originStats`)
    * — correct for one checkpoint, but in an ITERATIVE loop where each
    * round's plan joins the previous round's checkpoint k times, the
    * estimated sizeInBytes compounds as size^k per round: the BigInt
    * grows exponentially in BIT LENGTH, and by round ~10 the stats
    * visitor is multiplying million-bit integers on the driver (the
    * observed failure: a connected-components loop pinned at 100% CPU
    * inside BigInteger.multiply). This variant builds the LogicalRDD
    * with NO origin stats, so every round's plan starts from the
    * constant default estimate. Lazy: the first action materializes
    * the checkpoint (same contract as `localCheckpoint(eager = false)`).
    */
  def localCheckpointNoStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = cds.sparkSession
    val internal = cds.queryExecution.toRdd.map(_.copy())
    internal.localCheckpoint()
    ofRows(session, org.apache.spark.sql.execution.LogicalRDD(
      cds.queryExecution.analyzed.output, internal)(session))
  }

  /** Drop the checkpoint blocks behind a DataFrame produced by
    * [[localCheckpointNoStats]] (its analyzed plan is exactly one
    * LogicalRDD). Iterative loops MUST call this on the previous
    * round's checkpoint once the next round has materialized —
    * otherwise every round's blocks pile up on the executors until the
    * ContextCleaner happens to run (unbounded for deep graphs). The
    * DataFrame is dead after this call: a locally-checkpointed RDD has
    * no lineage to recompute from.
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case other => throw new IllegalArgumentException(
          "unpersistCheckpoint expects a localCheckpointNoStats result " +
            s"(a bare LogicalRDD), got: ${other.nodeName}")
      }

  /** Idempotently add a planner strategy to a LIVE session
    * (`experimental.extraStrategies` — the runtime analogue of
    * `SparkSessionExtensions.injectPlannerStrategy`).
    */
  def addStrategy(
      spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
  }

  /** Register a function builder on a LIVE session (the
    * `withExtensions` path only applies at session construction —
    * `getOrCreate` silently ignores it when a session already exists).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
