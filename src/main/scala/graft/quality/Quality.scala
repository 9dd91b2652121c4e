package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations engine (reference: quality/expectations.py
  * 34-242 — Rule(name, condition, action) with WARN / DROP / FAIL /
  * QUARANTINE actions, pass/fail metrics, and a quarantine stream; also
  * the DLT expect/expect_or_drop decorators, SURVEY.md §2.12/F3).
  *
  * Rules stay data-driven SQL strings evaluated via expr() — no UDFs, so
  * conditions push into codegen. Metrics are ONE aggregation pass
  * (sum(when(rule))) per frame, not a filter().count() per rule like the
  * reference — at 100 TB that's 1 scan instead of |rules| scans.
  */
object Quality {

  sealed trait Action
  case object Warn extends Action
  case object Drop extends Action
  case object Fail extends Action
  case object Quarantine extends Action

  final case class Rule(name: String, condition: String, action: Action)

  final case class Result(
      clean: DataFrame,
      quarantined: DataFrame,
      metrics: DataFrame,
      failures: Seq[String])

  /** Evaluate rules against a frame. DROP rules filter silently,
    * QUARANTINE rules split rows out with a reason column, WARN rules only
    * count, FAIL rules report in `failures` when violated (caller decides
    * whether to abort — the engine never throws mid-pipeline).
    */
  def apply(df: DataFrame, rules: Seq[Rule]): Result = {
    val spark = df.sparkSession
    import spark.implicits._
    if (rules.isEmpty)
      // no rules: everything is clean, nothing quarantined, empty metrics
      // (the stack() path would otherwise emit the unparseable 'stack(0,)')
      return Result(df, df.limit(0),
        Seq.empty[(String, String, Long, Long)]
          .toDF("rule_name", "action", "failed_rows", "total_rows"),
        Seq.empty)

    // ONE aggregation pass, collected ONCE: the per-rule counts feed both
    // the metrics frame (built driver-side — rule names are data, never
    // spliced into SQL text, so quotes/dashes in a name cannot break the
    // query) and fail detection. The previous shape aggregated twice —
    // an eager collect for fail rules PLUS a re-aggregation whenever the
    // caller consumed the lazy metrics frame.
    val row = df.agg(
      count(lit(1)).as("total_rows"),
      rules.map(r =>
        sum(when(expr(r.condition), 0L).otherwise(1L)).as(s"failed_${r.name}")): _*)
      .collect()(0)
    val total = row.getLong(0)
    def failedCount(i: Int): Long = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
    val metricsLong = rules.zipWithIndex.map { case (r, i) =>
      (r.name, r.action.toString.toLowerCase, failedCount(i), total)
    }.toDF("rule_name", "action", "failed_rows", "total_rows")

    val dropCond = rules.filter(_.action == Drop)
      .map(r => expr(r.condition)).reduceOption(_ && _).getOrElse(lit(true))
    val quarantineRules = rules.filter(_.action == Quarantine)
    // NULL-as-violated, matching the metrics count (a row fails a rule
    // whenever the condition is not TRUE — `!expr(cond)` alone goes NULL
    // on a NULL condition and the row would silently land in `clean`
    // while the metrics counted it failed)
    val qReason = quarantineRules.foldRight(lit(null).cast("string")) {
      case (r, acc) =>
        when(!coalesce(expr(r.condition), lit(false)), r.name).otherwise(acc)
    }

    // loud on collision with the internal marker: withColumn would
    // silently OVERWRITE a user column named _q_reason, clean would then
    // drop it entirely and quarantined would rename it — a silent schema
    // change for any frame fed back through a second quality stage
    require(!df.columns.contains("_q_reason"),
      "input already has a _q_reason column (reserved by Quality.apply) — rename it first")
    val flagged = df.withColumn("_q_reason", qReason)
    val clean = flagged.filter(col("_q_reason").isNull).filter(dropCond).drop("_q_reason")
    val quarantined = flagged.filter(col("_q_reason").isNotNull)
      .withColumnRenamed("_q_reason", "quarantine_reason")

    val failViolations = rules.zipWithIndex
      .collect { case (r, i) if r.action == Fail && failedCount(i) > 0 => r.name }
    Result(clean, quarantined, metricsLong, failViolations)
  }
}
