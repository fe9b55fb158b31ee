package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A logical leaf whose rows come from a DataFrame computed ONLY at
  * execution time.
  *
  * Purpose: iterative operators (connected components, Lloyd's) must run
  * driver-side Spark jobs to even KNOW their output, so a SQL table
  * function that composes one would otherwise run those jobs at ANALYSIS
  * time — `EXPLAIN`, `DESCRIBE`, view re-resolution, or a second
  * reference in one query each silently re-running the whole screen.
  * Wrapping the iterative part in a DeferredRelation keeps planning
  * side-effect-free: the thunk fires inside [[DeferredRelationExec
  * .doExecute]], i.e. at the first ACTION on the composed query, and is
  * memoized so repeated executions of the same plan instance (broadcast
  * + probe, AQE stage retries, `df.count(); df.show()`) compute it once.
  *
  * The thunk's result schema must match `output` positionally (types,
  * not exprIds — downstream operators bind by ordinal through this
  * node's output). Stats are unknown before execution, so this leaf
  * reports the conservative default size (no static broadcast); with
  * AQE on, the runtime size of the leaf's shuffle output still converts
  * eligible joins to broadcast.
  */
case class DeferredRelation(output: Seq[Attribute], label: String,
                            thunk: () => DataFrame) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def simpleString(maxFields: Int): String =
    s"DeferredRelation [$label], deferred to first execution"
}

/** Physical twin: runs the thunk at doExecute (never at planning). */
case class DeferredRelationExec(output: Seq[Attribute], label: String,
                                thunk: () => DataFrame) extends LeafExecNode {
  // memoized: one computation per plan instance, not per execute() call
  @transient private lazy val materialized: DataFrame = thunk()
  override protected def doExecute(): RDD[InternalRow] =
    materialized.queryExecution.toRdd
  override def simpleString(maxFields: Int): String =
    s"DeferredRelationExec [$label], runs at first action"
}

/** Planner strategy for [[DeferredRelation]] — injected via
  * `GraftExtensions` (session build) or appended to
  * `spark.experimental.extraStrategies` (live session). */
object DeferredRelationStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredRelation(out, label, thunk) =>
      DeferredRelationExec(out, label, thunk) :: Nil
    case _ => Nil
  }
}
