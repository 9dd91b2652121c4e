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
  * arboricity bound), so wedge volume is O(m^1.5) worst-case instead of
  * Σ d². Both the wedge self-join (src-keyed) and the closing join
  * ((x,y)-keyed) are plain shuffle hash joins: AQE-skew-splittable, no
  * driver state. The oriented edge frame feeds both sides of the wedge
  * self-join with different projections, which blocks ReusedExchange —
  * checkpointed once (the repo-documented d4/e5 lesson), as is the edge
  * list (consumed by degrees, both orientation probes, and the closing
  * join).
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
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // probed once per endpoint side
    // (deg, id) total order; a < b already, so the tie case keeps a
    val aFirst = col("da") < col("db") || (col("da") === col("db"))
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true) // both sides of the wedge self-join
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), "src")
      // each unordered out-pair once; id-comparison (not order-position)
      // is enough because the closing edge set is id-canonical (a < b)
      .filter(col("x") < col("y"))
    val tri = wedges.join(e.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    tri.select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
  }
}
