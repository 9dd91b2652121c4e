package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.quality.Quality

/** Declarative pipeline runner — the OSS substitute for the reference's
  * DLT layer (src/dlt_pipelines modules, SURVEY.md §2.12): named table
  * definitions with expectations, dependency-resolved execution, per-table
  * quality metrics.
  *
  * A table body reads upstream tables via `read(name)`; dependencies are
  * whatever it actually reads (recorded at registration, declared
  * explicitly). Execution memoizes each table once per run — the DAG is
  * topologically executed by recursion, cycles rejected.
  */
final class Pipeline(spark: SparkSession) {

  final case class TableDef(
      name: String,
      deps: Seq[String],
      rules: Seq[Quality.Rule],
      body: Map[String, DataFrame] => DataFrame)

  private val defs = mutable.LinkedHashMap.empty[String, TableDef]
  private val metricsLog = mutable.ArrayBuffer.empty[DataFrame]

  /** Register a table: `deps` are upstream table names passed to `body`. */
  def table(name: String, deps: Seq[String] = Nil, rules: Seq[Quality.Rule] = Nil)(
      body: Map[String, DataFrame] => DataFrame): this.type = {
    require(!defs.contains(name), s"duplicate table $name")
    defs(name) = TableDef(name, deps, rules, body)
    this
  }

  /** Execute the DAG; returns every materialized table by name. */
  def run(): Map[String, DataFrame] = {
    val done = mutable.LinkedHashMap.empty[String, DataFrame]
    val inFlight = mutable.Set.empty[String]

    def build(name: String): DataFrame = done.getOrElse(name, {
      require(defs.contains(name), s"unknown table $name")
      require(inFlight.add(name), s"dependency cycle through $name")
      val td = defs(name)
      val inputs = td.deps.map(dep => dep -> build(dep)).toMap
      val raw = td.body(inputs)
      val out =
        if (td.rules.isEmpty) raw
        else {
          val res = Quality.apply(raw, td.rules)
          require(res.failures.isEmpty,
            s"table $name failed expectations: ${res.failures.mkString(",")}")
          metricsLog += res.metrics.withColumn("table_name",
            org.apache.spark.sql.functions.lit(name))
          res.clean
        }
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
