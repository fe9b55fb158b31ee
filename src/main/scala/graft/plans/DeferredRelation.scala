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
  * memoized in a [[DeferredMemo]] cell OWNED BY THE LOGICAL NODE — not
  * the physical one, which is rebuilt by every re-planning: each action
  * (`df.count(); df.show()`), each reference in a multi-branch plan,
  * and each AQE re-optimization constructs a fresh exec node, so a
  * per-exec lazy val would re-run the whole screen per action. The memo
  * travels through `copy()`/canonicalization because it is a
  * constructor argument, so every plan copy of one TVF call shares one
  * computation.
  *
  * The thunk's result schema must match `output` positionally (types,
  * not exprIds — downstream operators bind by ordinal through this
  * node's output). Stats are unknown before execution, so this leaf
  * reports the conservative default size (no static broadcast); with
  * AQE on, the runtime size of the leaf's shuffle output still converts
  * eligible joins to broadcast.
  */
/** Single-slot driver-side memo for a deferred computation: one
  * evaluation no matter how many physical plan instances reference it.
  * `@transient lazy` — the exec node only dereferences it on the
  * driver (doExecute), never on executors. */
final class DeferredMemo(thunk: () => DataFrame) extends Serializable {
  // driver-side only (like `value`); lazy so deserialization re-creates
  // rather than nulls it
  @transient private lazy val evals =
    new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many times the thunk actually ran — 0 until the first action,
    * 1 ever after. The direct (non-timing) observable for memoization
    * tests: Spark job counts are delivered async and vary with AQE. */
  def evalCount: Int = evals.get()
  @transient lazy val value: DataFrame = { evals.incrementAndGet(); thunk() }
}

case class DeferredRelation(output: Seq[Attribute], label: String,
                            memo: DeferredMemo) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def simpleString(maxFields: Int): String =
    s"DeferredRelation [$label], deferred to first execution"
}

object DeferredRelation {
  def apply(output: Seq[Attribute], label: String,
            thunk: () => DataFrame): DeferredRelation =
    DeferredRelation(output, label, new DeferredMemo(thunk))
}

/** Physical twin: dereferences the SHARED memo at doExecute (never at
  * planning) — re-planning builds new exec nodes, but they all point at
  * the logical node's one cell. */
case class DeferredRelationExec(output: Seq[Attribute], label: String,
                                memo: DeferredMemo) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] =
    memo.value.queryExecution.toRdd
  override def simpleString(maxFields: Int): String =
    s"DeferredRelationExec [$label], runs at first action"
}

/** Planner strategy for [[DeferredRelation]] — injected via
  * `GraftExtensions` (session build) or appended to
  * `spark.experimental.extraStrategies` (live session). */
object DeferredRelationStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredRelation(out, label, memo) =>
      DeferredRelationExec(out, label, memo) :: Nil
    case _ => Nil
  }
}
