package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.quality.Quality

/** Declarative pipeline runner — the OSS substitute for the reference's
  * DLT layer (src/dlt_pipelines modules, SURVEY.md §2.12): named table
  * definitions with expectations, dependency-resolved execution, per-table
  * quality metrics, and per-table retry/timeout policies matching the
  * reference's orchestration contract
  * (orchestration/workflow_definitions.json:22-180: max_retries,
  * min_retry_interval_millis, timeout_seconds, retry_on_timeout).
  *
  * A table body receives its declared upstream tables as a
  * Map[String, DataFrame] (`deps` at registration IS the dependency
  * list — an undeclared read is impossible by construction, since the
  * body sees only the map). Execution memoizes each table once per run — the DAG is
  * topologically executed by recursion, cycles rejected. A table that
  * exhausts its retries throws, which stops its dependents exactly as an
  * expectation-gate failure does.
  */
final class Pipeline(spark: SparkSession) {

  final case class TableDef(
      name: String,
      deps: Seq[String],
      rules: Seq[Quality.Rule],
      policy: Pipeline.RetryPolicy,
      body: Map[String, DataFrame] => DataFrame)

  private val defs = mutable.LinkedHashMap.empty[String, TableDef]
  private val metricsLog = mutable.ArrayBuffer.empty[DataFrame]

  /** Register a table: `deps` are upstream table names passed to `body`;
    * `policy` governs retries/timeout of the table's build+gate. */
  def table(name: String, deps: Seq[String] = Nil, rules: Seq[Quality.Rule] = Nil,
      policy: Pipeline.RetryPolicy = Pipeline.RetryPolicy())(
      body: Map[String, DataFrame] => DataFrame): this.type = {
    require(!defs.contains(name), s"duplicate table $name")
    defs(name) = TableDef(name, deps, rules, policy, body)
    this
  }

  /** Execute the DAG; returns every materialized table by name. */
  def run(): Map[String, DataFrame] = {
    // `metrics` is "accumulated by the LAST run": without the reset a
    // re-run would union the previous run's frames too, double-counting
    // every rule
    metricsLog.clear()
    val done = mutable.LinkedHashMap.empty[String, DataFrame]
    val inFlight = mutable.Set.empty[String]

    def build(name: String): DataFrame = done.getOrElse(name, {
      require(defs.contains(name), s"unknown table $name")
      require(inFlight.add(name), s"dependency cycle through $name")
      val td = defs(name)
      val inputs = td.deps.map(dep => dep -> build(dep)).toMap
      // the attempt covers body + expectation gate: the gate is the
      // materializing action for rule-bearing tables (a ruleless table's
      // body is lazy plan construction — wrap your own action in the
      // body if its failure should be retryable)
      // the attempt thunk RETURNS its metrics instead of appending them:
      // a timed-out attempt's abandoned thread could otherwise complete
      // late and append concurrently with (and in addition to) the retry
      // — a data race on the buffer plus double-counted metrics for an
      // attempt that was reported dead. Only the winning attempt's
      // metrics are recorded, from the calling thread.
      val (out, attemptMetrics) = Pipeline.withPolicy(name, td.policy, Some(spark)) {
        val raw = td.body(inputs)
        if (td.rules.isEmpty) (raw, None)
        else {
          val res = Quality.apply(raw, td.rules)
          require(res.failures.isEmpty,
            s"table $name failed expectations: ${res.failures.mkString(",")}")
          (res.clean, Some(res.metrics.withColumn("table_name",
            org.apache.spark.sql.functions.lit(name))))
        }
      }
      attemptMetrics.foreach(metricsLog += _)
      inFlight.remove(name)
      done(name) = out
      out
    })

    defs.keys.foreach(build)
    done.toMap
  }

  /** Per-table, per-rule pass/fail counts accumulated by the last run. */
  def metrics: Option[DataFrame] = metricsLog.reduceOption(_.unionByName(_))
}

object Pipeline {

  /** Per-table retry/timeout contract, field-for-field the reference's
    * task retry_policy + timeout_seconds
    * (orchestration/workflow_definitions.json:22-180; its production
    * defaults are maxRetries = 2, minRetryIntervalMillis = 60000,
    * retryOnTimeout = true). Defaults here are inert (no retry, no
    * timeout) so existing pipelines are unchanged. timeoutMillis <= 0
    * disables the timeout. */
  final case class RetryPolicy(
      maxRetries: Int = 0,
      minRetryIntervalMillis: Long = 0L,
      timeoutMillis: Long = 0L,
      retryOnTimeout: Boolean = true)

  /** A table attempt exceeded its policy timeout. */
  final class TaskTimeoutException(name: String, millis: Long)
    extends RuntimeException(s"table $name timed out after ${millis}ms")

  /** Run `thunk` under `policy`: per-attempt timeout on a daemon thread,
    * up to maxRetries re-attempts with the configured pause. When a
    * SparkSession is supplied, each attempt runs inside its own JOB GROUP
    * and a timeout cancels the group cluster-side (interruptOnCancel) —
    * a bare thread interrupt would only abandon the driver thread while
    * the DAGScheduler kept executing the submitted job, so the retry
    * would run concurrently with the undead attempt (duplicate writes,
    * doubled cluster load). Deterministic failures (e.g.
    * expectation-gate require) burn their retries and still throw — same
    * observable contract as the reference, where the orchestrator can't
    * tell flaky from broken. Fatal errors (OOM, interrupts —
    * !NonFatal) are never retried: re-attempting against a poisoned JVM
    * only masks the condition. */
  private[pipeline] def withPolicy[T](name: String, policy: RetryPolicy,
      spark: Option[SparkSession] = None)(thunk: => T): T = {
    var attempt = 0
    def once(): T =
      if (policy.timeoutMillis <= 0) thunk
      else {
        val groupId = s"graft-pipeline-$name-$attempt-${System.nanoTime()}"
        val task = new java.util.concurrent.FutureTask[T](() =>
          spark match {
            case Some(s) =>
              s.sparkContext.setJobGroup(groupId,
                s"pipeline table $name attempt $attempt", interruptOnCancel = true)
              try thunk finally s.sparkContext.clearJobGroup()
            case None => thunk
          })
        val t = new Thread(task, s"graft-pipeline-$name")
        t.setDaemon(true)
        t.start()
        try task.get(policy.timeoutMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            task.cancel(true)
            // kill the attempt's cluster-side work before the retry
            // runs. cancelJobGroup only reaches jobs ACTIVE at call
            // time — an attempt stuck in non-interruptible driver-side
            // work could submit its first job AFTER this call and run
            // alongside the retry (duplicate writes). The watchdog
            // re-cancels the group until the undead thread actually
            // exits, so a late-submitted job dies within a beat.
            spark.foreach { s =>
              s.sparkContext.cancelJobGroup(groupId)
              val w = new Thread(() => {
                try while (t.isAlive) {
                  Thread.sleep(2000)
                  s.sparkContext.cancelJobGroup(groupId)
                } catch { case _: InterruptedException => () }
              }, s"graft-pipeline-$name-watchdog")
              w.setDaemon(true)
              w.start()
            }
            // bound the undead window before the caller can retry: give
            // the cancelled attempt thread a short grace to actually
            // exit, so driver-side NON-Spark side effects in a table
            // body (snapshot commits, manifest/file writes) don't
            // interleave with the retry's. A thread stuck past the
            // grace is the watchdog's to kill; bodies whose side
            // effects live outside Spark jobs must additionally be
            // idempotent (the engine's own MERGE/commit paths are).
            try t.join(5000)
            catch { case _: InterruptedException =>
              Thread.currentThread().interrupt() }
            throw new TaskTimeoutException(name, policy.timeoutMillis)
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      }
    var attemptsLeft = policy.maxRetries
    while (true) {
      try return once()
      catch {
        case e: Throwable =>
          val retryable = scala.util.control.NonFatal(e) &&
            (!e.isInstanceOf[TaskTimeoutException] || policy.retryOnTimeout)
          if (attemptsLeft <= 0 || !retryable) throw e
          attemptsLeft -= 1
          attempt += 1
          if (policy.minRetryIntervalMillis > 0)
            Thread.sleep(policy.minRetryIntervalMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
