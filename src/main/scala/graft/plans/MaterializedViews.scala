package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Transparent materialized-view rewrite (SURVEY.md §4 "custom
  * pieces", the classic warehouse accelerator): a view is REGISTERED
  * as (fingerprint of its optimized logical plan → parquet
  * materialization), and [[RewriteToMaterializedView]] — injected via
  * [[GraftExtensions]] — swaps any later query subtree with the same
  * fingerprint for a scan of the materialization. The user keeps
  * writing the declarative aggregate; the optimizer decides to read
  * the precomputed answer.
  *
  * Matching is EXACT (canonicalized-plan fingerprint, which
  * normalizes exprIds and cosmetic aliases): the sound, predictable
  * core of MV rewriting. Containment-based rewriting (answering a
  * NARROWER query from a WIDER view) is deliberately out of scope —
  * its correctness conditions (rollup-ability of every aggregate,
  * join-preservation proofs) are a research surface, while
  * exact-match covers the operational pattern of a shared dashboard
  * aggregate computed once and read many times.
  *
  * Scale posture: the registry holds fingerprints + paths (O(views)
  * driver metadata); the rewrite itself turns an O(fact-table)
  * aggregate into an O(|view|) scan, and the materialization is an
  * ordinary distributed parquet write, refreshable by re-calling
  * [[register]].
  */
object MaterializedViews {

  private final case class Entry(path: String)

  private val registry = new ConcurrentHashMap[String, Entry]()

  /** Rule-side reentrancy/registration guard: while a plan is being
    * fingerprinted for registration, the rewrite must not fire (it
    * would fingerprint the already-rewritten plan). */
  private val enabled = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = true
  }

  private def withRewriteDisabled[T](f: => T): T = {
    enabled.set(false)
    try f finally enabled.set(true)
  }

  private[plans] def active: Boolean = !registry.isEmpty && enabled.get()

  private[plans] def lookup(fingerprint: String): Option[String] =
    Option(registry.get(fingerprint)).map(_.path)

  /** Fingerprint of a DataFrame's OPTIMIZED plan — registration and
    * rewrite must canonicalize at the same optimizer phase, or
    * column-pruning/pushdown differences break the match. */
  private def fingerprint(df: DataFrame): String =
    withRewriteDisabled { df.queryExecution.optimizedPlan.canonicalized.toString }

  /** Materialize `df` under `basePath` and register its plan
    * fingerprint for rewriting. Returns the fingerprint (exposed for
    * tests/ops that want to assert or deregister).
    *
    * Each registration writes an IMMUTABLE fresh directory
    * (`basePath-<uuid>`) and publishes the registry entry only after
    * the write completes — never an in-place overwrite. In-place
    * refresh raced concurrent readers two ways (both observed when
    * test suites share one session): a plan built against the old
    * files executed after the overwrite deleted them
    * (FILE_NOT_EXIST), and the rule's schema read during the
    * overwrite window found an empty directory
    * (UNABLE_TO_INFER_SCHEMA). With immutable directories a
    * registered path's files never change; superseded
    * materializations are left for the tmp-dir lifecycle (a refresh
    * is rare and view-sized). */
  def register(df: DataFrame, basePath: String): String = {
    val fp = fingerprint(df)
    val path = s"$basePath-${java.util.UUID.randomUUID()}"
    // the WRITE must also run with rewriting disabled: on a REFRESH
    // the fingerprint is already registered, and a rewriting-enabled
    // write job would answer the recompute from the OLD
    // materialization — copying stale bytes forward forever instead
    // of recomputing from base data
    withRewriteDisabled { df.write.parquet(path) }
    registry.put(fp, Entry(path))
    fp
  }

  def deregister(fingerprint: String): Unit = registry.remove(fingerprint)

  def clear(): Unit = registry.clear()
}

/** The optimizer rule: any Aggregate subtree whose canonicalized form
  * matches a registered view is replaced by a scan of the
  * materialization, with the scan's output re-aliased under the
  * original output's exprIds (and cast to the original types) so every
  * parent reference keeps resolving. Only Aggregate roots are
  * fingerprinted — the registry is consulted O(aggregates-per-plan)
  * times, not per node. */
class RewriteToMaterializedView(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!MaterializedViews.active) plan
    else plan.transformDown {
      case agg: Aggregate if agg.resolved =>
        MaterializedViews.lookup(agg.canonicalized.toString) match {
          case Some(path) =>
            val mv = spark.read.parquet(path).queryExecution.analyzed
            Project(
              agg.output.zip(mv.output).map { case (orig, fromMv) =>
                Alias(Cast(fromMv, orig.dataType), orig.name)(exprId = orig.exprId)
              }, mv)
          case None => agg
        }
    }
}
