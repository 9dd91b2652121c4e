package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration over an undirected edge list — the
  * cohesion primitive of graph-shaped corpus curation (community
  * density, link-farm detection, co-citation strength) and the classic
  * "does your join strategy survive skew" benchmark.
  *
  * Algorithm: degree-ordered orientation (Chiba–Nishizeki / the
  * MapReduce formulation of Suri & Vassilvitskii, WWW'11). Every
  * undirected edge is directed from its lower endpoint to its higher
  * endpoint under the total order (degree, id); a triangle {u,v,w} then
  * has EXACTLY ONE vertex whose two triangle edges are both out-edges
  * (its minimum under the order), so emitting each out-wedge (x,y) of an
  * apex and intersecting with the edge set counts every triangle once —
  * no post-hoc dedup, and counts are exact integers (bit-stable under
  * any partitioning).
  *
  * Scale: orientation is WHY this survives skew — a degree-d hub
  * generates C(d,2) wedges under naive id-ordering but only
  * C(d_out,2) here, and max out-degree is O(√m) on any graph (an
  * arboricity bound), so intersection work is O(m^1.5) worst-case
  * instead of Σ d². The closing step is the EDGE-ITERATOR formulation:
  * per-node oriented out-neighborhoods are collected once (≤ O(√m)
  * longs per node), joined to both endpoints of each oriented edge, and
  * the triangle set per edge is a local sorted-array intersection — the
  * O(m^1.5) wedge volume stays INSIDE codegen'd array kernels instead of
  * materializing as shuffled rows (the explicit wedge self-join shape
  * measured 6× slower at 1.2M edges / 41M wedges: 41M rows through an
  * exchange vs 41M in-memory comparisons). Explode volume is exactly the
  * triangle count. Both edge⋈adjacency joins are plain shuffle hash
  * joins on node keys: AQE-skew-splittable (broadcastable when the
  * adjacency frame is small), no driver state. The adjacency frame feeds
  * both joins with different key projections, which blocks
  * ReusedExchange — checkpointed once (the repo-documented d4/e5
  * lesson), as are the oriented edges and the raw edge list.
  */
object Triangles {

  /** Per-node triangle participation counts.
    *
    * @param edges undirected edges as columns (a, b) with a < b,
    *              distinct — one row per edge.
    * @return (node, tri_cnt) for every node in ≥1 triangle.
    */
  def participation(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint(true)
    val degRaw = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // probed once per endpoint side
    // Broadcast the degree table under the same materialized-size budget
    // as the adjacency below (two flat longs per node — cheaper per row
    // than adj's arrays): both orientation joins then run map-side over
    // the checkpointed edge list instead of shuffling it twice by each
    // endpoint (r15, guide §2.4/§3.1 — the count is free on the
    // checkpointed frame, so this is an informed runtime choice, not a
    // stats guess). Above the cap, node-keyed shuffle joins that AQE
    // skew-splits, as before.
    val deg =
      if (degRaw.count() <= 4000000L) broadcast(degRaw) else degRaw
    // (deg, id) total order; a < b already, so the tie case keeps a
    val aFirst = col("da") < col("db") || (col("da") === col("db"))
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true) // feeds the adjacency build AND the edge probe
    val adjRaw = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true) // probed once per endpoint side
    // The adjacency payload is exactly ONE long per oriented edge, and
    // the edge count is free on the checkpointed frame — so the join
    // strategy is an informed runtime choice, not a stats guess (a
    // checkpointed LogicalRDD has no size stats, so Catalyst would
    // default these to sort-merge and ship each edge row's two ~√m-long
    // neighbor arrays through BOTH shuffles — measured 2× the whole
    // op's cost at 1.2M edges). The threshold budgets the MATERIALIZED
    // broadcast, not raw payload: 4M edges is ~32 MB of neighbor longs,
    // but each broadcast copy pays UnsafeRow + array headers and the
    // HashedRelation table on top — a conservative ~4-6× multiplier
    // puts the resident structure near ~150-200 MB, the sane ceiling
    // for a per-executor broadcast. Above it, plain node-keyed shuffle
    // joins that AQE skew-splits.
    val adj =
      if (oriented.count() <= 4000000L) broadcast(adjRaw) else adjRaw
    // triangle {u,v,w} (u<v<w under the order) is found exactly once: at
    // its base edge u→v, as w ∈ N+(u) ∩ N+(v). An endpoint missing from
    // adj has no out-edges — the inner join drops the edge, which is
    // exact (its intersection would be empty).
    val common = oriented
      .join(adj.select(col("src"), col("nbrs").as("sn")), "src")
      .join(adj.select(col("src").as("dst"), col("nbrs").as("dn")), "dst")
      .select(col("src"), col("dst"),
        array_intersect(col("sn"), col("dn")).as("tw"))
      .filter(size(col("tw")) > 0)
    // All three per-triangle contributions (both base endpoints at the
    // edge's triangle count, each third vertex at 1) emitted in ONE
    // row-local explode — the previous two-branch union consumed
    // `common` twice, which forced a checkpoint barrier between the
    // intersection pass and the count agg; fused, the wedge intersection
    // streams straight into the count's map-side partial (r15, guide
    // §2.4: one pass, one exchange, no materialization).
    common
      .select(explode(concat(
        array(
          struct(col("src").as("node"), size(col("tw")).cast("long").as("c")),
          struct(col("dst").as("node"), size(col("tw")).cast("long").as("c"))),
        transform(col("tw"), w => struct(w.as("node"), lit(1L).as("c"))))).as("nc"))
      .groupBy(col("nc.node").as("node")).agg(sum(col("nc.c")).as("tri_cnt"))
  }
}
