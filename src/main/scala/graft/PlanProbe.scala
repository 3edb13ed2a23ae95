package graft

import org.apache.spark.sql.DataFrame

/** Diagnostics seam for eagerly materialized query results.
  *
  * The persist-discipline queries (q130/q141/.../q146) return
  * `localCheckpoint()`ed frames so their `finally unpersist` cannot drop
  * cached blocks under a lazy evaluation (SCALE.md round-18). That makes
  * the returned frame's plan an opaque `Scan ExistingRDD` — the REAL plan
  * (the one the scale claims are about) executes inside the query. This
  * probe records that inner plan at the materialization site, keyed by
  * query name, so PlanSpec can keep pinning broadcast/WindowGroupLimit/
  * no-cartesian shapes. Disabled by default: `probe` is identity unless a
  * caller (PlanSpec) switches it on, so production/bench pay nothing.
  */
object PlanProbe {
  private val plans = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val formatted = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val executions = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.execution.QueryExecution]()
  @volatile private var enabled = false

  /** Enabling CLEARS prior recordings (r18 advice): entries otherwise
    * accumulate process-globally, so a consumer enabling the probe could
    * read a stale plan recorded by an earlier run of the same query in
    * this JVM. Within one enabled window, last-write-wins per name —
    * consumers (PlanSpec, ExplainDump) run their queries sequentially.
    * DISABLING releases the heavyweight retention (r20 advice): the
    * executions map pins full QueryExecution objects (final AQE plans,
    * SQLMetrics, broadcast refs, and via InMemoryTableScan the
    * cached-relation plans) — without the clear they stay pinned for the
    * JVM's lifetime after a probe window closes (e.g. ExplainDump over
    * all 157 queries). Execution consumers (StageReuseSpec,
    * SkewAuditSpec) read — or take references — inside their enabled
    * window; the plan STRINGS stay available after disable (they are
    * small, and PlanSpec reads them post-window). */
  def setEnabled(on: Boolean): Unit = {
    if (on) { plans.clear(); formatted.clear() }
    executions.clear()
    enabled = on
  }

  /** Snapshot of every recorded key (mainline names and `name#<sub>`
    * probes) — lets a consumer enumerate a query's sub-executions without
    * knowing their suffixes. */
  def allNames: java.util.Set[String] = formatted.keySet()

  /** Record `df`'s executed plan under `name` (when enabled) and return
    * `df` unchanged — call directly before the materialization. */
  def probe(name: String, df: DataFrame): DataFrame = {
    if (enabled) {
      plans.put(name, df.queryExecution.executedPlan.toString)
      formatted.put(name, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      executions.put(name, df.queryExecution)
    }
    df
  }

  def get(name: String): Option[String] = Option(plans.get(name))

  /** The live QueryExecution behind the probed materialization — after
    * the query's eager action (localCheckpoint) this is the SAME object
    * that executed, so its AdaptiveSparkPlanExec holds the final
    * materialized stages and populated SQLMetrics. StageReuseSpec reads
    * scan-execution counts off it and the join-key pins walk its plan
    * OBJECTS instead of matching plan strings (r19 advice: string pins
    * go vacuous under attribute renames). */
  def getExecution(name: String)
      : Option[org.apache.spark.sql.execution.QueryExecution] =
    Option(executions.get(name))

  /** Every recorded execution under `name` or `name#<sub>` — composite
    * queries that materialize intermediates mid-fn (q157's LSH edge
    * frames) probe those under suffixed keys so a consumer can account
    * for ALL the work, not just the final frame's plan. */
  def getExecutionTree(name: String)
      : Seq[org.apache.spark.sql.execution.QueryExecution] = {
    import scala.jdk.CollectionConverters._
    executions.asScala.collect {
      case (k, qe) if k == name || k.startsWith(name + "#") => qe
    }.toSeq
  }

  /** FormattedMode twin of [[get]] — what ExplainDump writes to PLANS.md. */
  def getFormatted(name: String): Option[String] = Option(formatted.get(name))
}
