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

  /** The FROZEN headline subset (round 14): cross-round performance
    * comparisons use ONLY this set, measured FIRST in every bench
    * session in this exact order. The full bench set keeps growing with
    * coverage (22 → 42 queries over rounds 6–13), which made full-suite
    * totals conflate suite growth with engine cost (48.4 → 65.6 s while
    * per-query code got faster) — the fix is a fixed basket, like any
    * price index. One entry per family: aggregation, wide join, window,
    * SQL-door TPC-H, exact/LSH/PPJoin/SemDeDup dedup, live + persisted +
    * PQ ANN, MMR re-rank, chunk dedup, hybrid retrieval, graph,
    * streaming state. DO NOT add, remove, or reorder entries — a new
    * flagship operator earns a new basket only alongside a documented
    * re-base of every cross-round series in SCALE.md. */
  val headlineQueries: Seq[String] = Seq(
    "a1_customer_order_profile",
    "a4_multidim_revenue",
    "j1_customer_360",
    "w8_rank_top_parts",
    "sql4_local_supplier_volume",
    "d3_lsh_candidate_pairs",
    "d4_jaccard_pairs",
    "d8_semdedup",
    "e1_cosine_topk",
    "e13_mmr_rerank",
    "e14_ann_ivf_persisted",
    "e16_ann_ivfpq_persisted",
    "t12_chunk_dedup",
    "t30_hybrid_ann_rrf",
    "gr2_copurchase_triangles",
    "st9_stateful_sessionize")
}
