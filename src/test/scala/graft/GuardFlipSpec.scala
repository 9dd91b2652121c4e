package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{PageRank, Triangles}

/** Every broadcast guard must actually FLIP: below the cap the plan
  * carries the broadcast hint, above it the original keyed-shuffle plan
  * stands, and both branches are row-identical. Without these, the
  * over-guard fallback branches would only ever execute on a >cap corpus
  * — i.e. never in any local run — so a regression there would ship
  * silently (round-15 verdict item 3). The caps are forced with a 0-row
  * override parameter, the committed production defaults stay in the ops.
  */
class GuardFlipSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Pre-AQE physical plan — deterministic join strategies (checkpointed
    * inputs have no stats, so nothing auto-broadcasts; only our explicit
    * hints produce BroadcastHashJoin here). */
  private def physical(df: DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("Triangles edge-cap: shuffle branch is broadcast-free and row-identical") {
    val edges = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L if (a + b) % 3 != 0
    } yield (a, b)).toDF("a", "b")
    val bcDf = Triangles.participation(edges)
    val shDf = Triangles.participation(edges, broadcastEdgeCap = 0L)
    assert(physical(bcDf).contains("BroadcastHashJoin"),
      "under-cap branch must broadcast the degree/adjacency tables")
    assert(!physical(shDf).contains("BroadcastHashJoin"),
      "over-cap branch must not broadcast anything")
    val (bc, sh) = (rows(bcDf), rows(shDf))
    assert(bc == sh, s"branch outputs diverge:\n$bc\nvs\n$sh")
    assert(bc.nonEmpty)
  }

  test("PageRank node-caps: shuffle branch is row-identical") {
    val edges = Seq(
      (1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 1L, 3L), (4L, 5L, 1L), (5L, 4L, 1L), (2L, 5L, 2L))
      .toDF("src", "dst", "w")
    // final ranks are checkpointed per round (plan lineage is cut), so the
    // branch equivalence is pinned on rows; micro-rank arithmetic is exact
    // longs, so equality is bitwise
    val bc = rows(PageRank.run(edges, iterations = 3))
    val sh = rows(PageRank.run(edges, iterations = 3, broadcastNodeCap = 0L))
    assert(bc == sh, s"branch outputs diverge:\n$bc\nvs\n$sh")
    assert(bc.nonEmpty)
  }

  test("linkPrediction deg/anti caps: shuffle branch is broadcast-free and row-identical") {
    // gr5's shape (support-thresholded edges) exercises BOTH guards: the
    // wedge-side degree broadcast and the closing anti-join broadcast
    val bcDf = graft.queries.Graph.linkPrediction(spark, sf, cap = 200,
      minSupport = 2)
    val shDf = graft.queries.Graph.linkPrediction(spark, sf, cap = 200,
      minSupport = 2, degBroadcastCap = 0L, antiBroadcastCap = 0L)
    assert(physical(bcDf).contains("BroadcastHashJoin"),
      "under-cap branch must broadcast the center table and the edge set")
    assert(!physical(shDf).contains("BroadcastHashJoin"),
      "over-cap branch must not broadcast anything")
    val (bc, sh) = (rows(bcDf), rows(shDf))
    assert(bc == sh, s"branch outputs diverge: ${bc.size} vs ${sh.size} rows")
    assert(bc.nonEmpty)
  }

  test("d14 batch-cap: keyed-join branch is row-identical") {
    val bc = rows(graft.queries.Dedup.sequentialAdmission(spark, sf))
    val sh = rows(graft.queries.Dedup.sequentialAdmission(spark, sf,
      batchBroadcastCap = 0L))
    assert(bc == sh, s"branch outputs diverge: ${bc.size} vs ${sh.size} rows")
    assert(bc.nonEmpty)
  }
}
