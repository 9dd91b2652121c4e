package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared as a named query in one of
  * the [[QueryGroup]]s below; SQL-expressible ones carry a DuckDB oracle.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    Aggregates,
    Windows,
    Joins,
    Relational,
    Scalars,
    TextOps,
    Dedup,
    Embeddings,
    Streaming,
    Governance,
    Multimodal,
    Gold,
    Graph,
    Sources,
    SqlAnalytics)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.defs("j1_customer_360").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, qd) => name -> qd.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql), _)) =>
      name -> sql.trim.replaceAll("\\s+", " ")
    }

  def allDefs: Map[String, QueryDef] =
    groups.flatMap(_.defs).toMap

  /** Headline queries timed by Bench at sf0.1. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.collect { case (name, qd) if qd.bench => name -> qd.build }
}
