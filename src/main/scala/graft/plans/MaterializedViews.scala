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

  /** Materialization dirs superseded by a refresh/deregister, with the
    * time they were superseded. A registered path's files are immutable
    * (see [[register]]), so a superseded dir's only live readers are
    * queries planned BEFORE the refresh published; deleting after a
    * grace period (or eagerly in [[clear]], which test teardowns call
    * when no query is in flight) bounds the tmp-dir leak that in-place
    * refresh used to avoid at the cost of the FILE_NOT_EXIST race. */
  private val superseded = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  private val SupersededGraceMs = 60000L

  private def reapSuperseded(all: Boolean): Unit = {
    val cutoff = System.currentTimeMillis() - SupersededGraceMs
    var next = superseded.peek()
    while (next != null && (all || next._2 < cutoff)) {
      if (superseded.remove(next))
        graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(next._1))
      next = superseded.peek()
    }
  }

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

  /** UNTRUNCATED render of a canonicalized plan. `toString` (the old
    * fingerprint) elides expression lists past
    * spark.sql.debug.maxToStringFields (default 25), so two distinct
    * wide aggregates could share a fingerprint and a query would be
    * silently answered from the WRONG materialization; rendering with
    * maxFields = Int.MaxValue keeps every expression in the key. */
  private[plans] def render(plan: LogicalPlan): String =
    plan.treeString(false, false, Int.MaxValue, false, false)

  /** Fingerprint of a DataFrame's OPTIMIZED plan — registration and
    * rewrite must canonicalize at the same optimizer phase, or
    * column-pruning/pushdown differences break the match. */
  private def fingerprint(df: DataFrame): String =
    withRewriteDisabled { render(df.queryExecution.optimizedPlan.canonicalized) }

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
    * materializations are queued and reclaimed after a grace period
    * (next register/clear — see [[reapSuperseded]]). */
  def register(df: DataFrame, basePath: String): String = {
    val fp = fingerprint(df)
    val path = s"$basePath-${java.util.UUID.randomUUID()}"
    // the WRITE must also run with rewriting disabled: on a REFRESH
    // the fingerprint is already registered, and a rewriting-enabled
    // write job would answer the recompute from the OLD
    // materialization — copying stale bytes forward forever instead
    // of recomputing from base data
    withRewriteDisabled { df.write.parquet(path) }
    Option(registry.put(fp, Entry(path)))
      .foreach(old => superseded.add((old.path, System.currentTimeMillis())))
    reapSuperseded(all = false)
    fp
  }

  def deregister(fingerprint: String): Unit = {
    Option(registry.remove(fingerprint))
      .foreach(old => superseded.add((old.path, System.currentTimeMillis())))
    Option(incremental.remove(fingerprint))
      .foreach(e => superseded.add((e.statePath, System.currentTimeMillis())))
  }

  // ---- incremental (SnapshotTable-backed) views ----

  /** How a [[refresh]] satisfied itself. `inputFiles` is the file set
    * the new state was computed FROM — exposed so callers (and the
    * delta-cost spec) can assert a refresh scaled with the change
    * feed, not the base table. */
  final case class RefreshResult(fingerprint: String, mode: String,
    inputFiles: Seq[String])

  private final case class IncEntry(
    table: graft.tables.SnapshotTable,
    version: Long,
    statePath: String,
    basePath: String,
    query: DataFrame => DataFrame,
    partial: DataFrame => DataFrame,
    combine: DataFrame => DataFrame,
    finalizeFn: DataFrame => DataFrame)

  private val incremental = new ConcurrentHashMap[String, IncEntry]()

  /** Register a [[graft.tables.SnapshotTable]]-backed view maintained
    * INCREMENTALLY: alongside the user-facing materialization, a
    * keyed PARTIAL-aggregate state (e.g. per-key count + DECIMAL sum)
    * is persisted, and [[refresh]] over an append-only commit range
    * folds only the table's change feed into that state —
    * state' = combine(state ∪ partial(Δ)) — then finalizes, so a
    * refresh costs O(state + Δ), never O(table). The caller's
    * contract is the standard IVM decomposition:
    * `finalize(combine(partial(rows))) ≡ query(rows)` with
    * `combine` associative over unions of partial outputs (true for
    * the distributive aggregates: count/sum/min/max and anything
    * derived from them at finalize time).
    *
    * The registered fingerprint is of `query(table.read())` at the
    * CURRENT version, so the optimizer answers exactly the queries
    * that read the version the materialization reflects; refresh
    * re-fingerprints at the new version and atomically swaps the
    * registry entry. */
  def registerIncremental(table: graft.tables.SnapshotTable, basePath: String)(
      query: DataFrame => DataFrame,
      partial: DataFrame => DataFrame,
      combine: DataFrame => DataFrame,
      finalize: DataFrame => DataFrame): String = {
    val version = table.currentVersion
    val statePath = s"$basePath-state-${java.util.UUID.randomUUID()}"
    val viewPath = s"$basePath-${java.util.UUID.randomUUID()}"
    val fp = fingerprint(query(table.read(version)))
    withRewriteDisabled {
      combine(partial(table.read(version))).write.parquet(statePath)
      finalize(table.spark.read.parquet(statePath)).write.parquet(viewPath)
    }
    Option(registry.put(fp, Entry(viewPath)))
      .foreach(old => superseded.add((old.path, System.currentTimeMillis())))
    Option(incremental.put(fp, IncEntry(table, version, statePath, basePath,
      query, partial, combine, finalize)))
      .foreach(o => superseded.add((o.statePath, System.currentTimeMillis())))
    fp
  }

  /** Bring an incremental view up to its table's current version.
    * Append-only ranges fold the change feed into the partial state
    * (O(state + Δ)); rewriting commits in the range (merge, CDC,
    * compact) fall back to a full recompute — correct either way,
    * and the mode is reported so callers can alert on silent
    * de-incrementalization. Returns None if the fingerprint is not
    * an incremental view. */
  def refresh(fp: String): Option[RefreshResult] = {
    val e = Option(incremental.get(fp)).getOrElse(return None)
    val t = e.table
    val newVersion = t.currentVersion
    if (newVersion == e.version)
      return Some(RefreshResult(fp, "noop", Seq.empty))
    val appendOnly = t.isAppendOnly(e.version, newVersion)
    val newStatePath = s"${e.basePath}-state-${java.util.UUID.randomUUID()}"
    val newViewPath = s"${e.basePath}-${java.util.UUID.randomUUID()}"
    val (newStateDf, mode) =
      if (appendOnly) {
        val delta = t.changesBetween(e.version, newVersion)
        (e.combine(t.spark.read.parquet(e.statePath).unionAll(e.partial(delta))),
          "incremental")
      } else (e.combine(e.partial(t.read(newVersion))), "full")
    val inputs = withRewriteDisabled { newStateDf.inputFiles.toSeq }
    val newFp = withRewriteDisabled {
      newStateDf.write.parquet(newStatePath)
      e.finalizeFn(t.spark.read.parquet(newStatePath)).write.parquet(newViewPath)
      fingerprint(e.query(t.read(newVersion)))
    }
    // swap: new fingerprint answers current-version queries; the old
    // fingerprint (now stale) and its dirs are superseded
    Option(registry.put(newFp, Entry(newViewPath)))
      .foreach(old => superseded.add((old.path, System.currentTimeMillis())))
    incremental.put(newFp, e.copy(version = newVersion, statePath = newStatePath))
    if (newFp != fp) {
      Option(registry.remove(fp))
        .foreach(old => superseded.add((old.path, System.currentTimeMillis())))
      Option(incremental.remove(fp))
        .foreach(o => superseded.add((o.statePath, System.currentTimeMillis())))
    }
    reapSuperseded(all = false)
    Some(RefreshResult(newFp, mode, inputs))
  }

  /** Drop every entry and eagerly reclaim all superseded dirs (the
    * caller asserts no registered-view query is in flight — true for
    * test teardowns and shutdown hooks, the only callers). Dirs still
    * REGISTERED at clear() time are left on disk: a concurrently
    * planned query may reference them, and they are tmp-dir scoped. */
  def clear(): Unit = {
    registry.clear()
    incremental.clear()
    reapSuperseded(all = true)
  }
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
        MaterializedViews.lookup(MaterializedViews.render(agg.canonicalized)) match {
          case Some(path) =>
            val mv = spark.read.parquet(path).queryExecution.analyzed
            // zip would silently TRUNCATE on arity mismatch, dropping
            // output columns from a rewritten plan — a mismatch means
            // the fingerprint matched a materialization of a different
            // shape, which must fail loudly, not corrupt results
            require(agg.output.length == mv.output.length,
              s"materialized view at $path has ${mv.output.length} columns; " +
                s"matched aggregate produces ${agg.output.length}")
            Project(
              agg.output.zip(mv.output).map { case (orig, fromMv) =>
                Alias(Cast(fromMv, orig.dataType), orig.name)(exprId = orig.exprId)
              }, mv)
          case None => agg
        }
    }
}
