package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * cluster-resolution step of a dedup pipeline: near-dup PAIRS (from LSH /
  * Jaccard / SimHash) become duplicate CLUSTERS, and the smallest doc id
  * in each cluster is the canonical survivor.
  *
  * Algorithm: iterative label propagation. Every node starts with its own
  * id as label; each round, a node takes the min of its label and its
  * neighbors' labels; converged when no label changes. Each round is one
  * distributed join + one aggregation (both key shuffles) — the driver
  * only counts changed labels, never materializes them. Rounds are
  * bounded by the cluster diameter, which for near-dup graphs is tiny
  * (dup clusters are dense). For high-diameter graphs at 100 TB, use
  * [[alternatingStar]] — the large-star/small-star path-contraction
  * variant (O(log n) rounds) behind the same contract, equivalence-tested
  * in ConnectedComponentsSpec.
  */
object ConnectedComponents {

  /** @param edges two numeric columns (`srcCol`, `dstCol`), undirected
    * @param nodes one numeric column (`idCol`) — nodes without edges form
    *              singleton clusters
    * @return (id, cluster) where cluster = min node id in the component
    */
  def minLabel(
      edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String,
      maxIter: Int = 25): DataFrame = {
    val directed = edges
      .select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .union(edges.select(col(dstCol).as("_src"), col(srcCol).as("_dst")))
      .distinct()
      .localCheckpoint(true)
    // seed labels from nodes ∪ edge endpoints: an endpoint missing from
    // `nodes` would otherwise never compete as a label (its id is absent
    // from the pool) and its change would be invisible to the convergence
    // count — mislabeling the component relative to alternatingStar,
    // which derives its universe from the edges themselves
    var labels = nodes.select(col(idCol).as("_id"))
      .union(directed.select(col("_src").as("_id")))
      .distinct()
      .select(col("_id"), col("_id").as("_lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val viaNeighbor = directed
        .join(labels, directed("_src") === labels("_id"))
        .select(col("_dst").as("_id"), col("_lbl"),
          lit(null).cast(labels.schema("_lbl").dataType).as("_old"))
      // carry each node's previous label through the min-aggregation
      // (every _id occurs exactly once in `labels`, so max(_old) recovers
      // it) — convergence detection is then a scan of the checkpointed
      // result, not a second join per round
      val next = labels.select(col("_id"), col("_lbl"), col("_lbl").as("_old"))
        .unionByName(viaNeighbor)
        .groupBy("_id").agg(min("_lbl").as("_lbl"), max("_old").as("_old"))
        .localCheckpoint(true) // cut lineage: O(1) plan depth per round
      changed = next.filter(col("_lbl") =!= col("_old")).count()
      labels = next.select("_id", "_lbl")
      i += 1
    }
    require(changed == 0, s"not converged after $maxIter rounds")
    labels.select(col("_id").as(idCol), col("_lbl").as("cluster"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round upgrade over per-hop label propagation: each round
    * CONTRACTS paths instead of advancing labels one hop, so a
    * diameter-d component needs ~log d rounds, not d. Same contract as
    * [[minLabel]] (PropertySpec checks equivalence on random graphs).
    *
    * Each phase is a per-node min + re-emit — expressed as one
    * aggregation (per-node min neighbor) joined back to the edges, i.e.
    * two key shuffles per phase, both map-side combinable, no
    * collect_list (a hub node's neighborhood never materializes in one
    * task — the skew-safety property that matters at 100 TB).
    *
    *  - large-star: every neighbor LARGER than u re-attaches to u's
    *    overall min neighbor m(u) = min(N(u) ∪ {u}).
    *  - small-star: u and its smaller neighbors re-attach to
    *    m≤(u) = min of that smaller neighborhood.
    *
    * Converged when the small-star pass changes nothing: every node then
    * points directly at its component's min id.
    */
  def alternatingStar(
      edges: DataFrame, srcCol: String, dstCol: String,
      nodes: DataFrame, idCol: String,
      maxIter: Int = 20): DataFrame = {
    // canonical (larger, smaller) orientation, self-loops dropped;
    // isolated nodes re-enter via the final left join
    var cur = edges
      .select(greatest(col(srcCol), col(dstCol)).as("_u"),
        least(col(srcCol), col(dstCol)).as("_v"))
      .filter(col("_u") =!= col("_v"))
      .distinct()
      .localCheckpoint(true)

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // large-star over the FULL neighborhood (both orientations):
      // every neighbor v > u re-attaches to m(u) = min(N(u) ∪ {u});
      // output keeps (larger, smaller) orientation since m(u) < v
      val sym = cur
        .union(cur.select(col("_v").as("_u"), col("_u").as("_v")))
      val lsMin = sym.groupBy("_u").agg(min("_v").as("_mn"))
        .select(col("_u"), least(col("_mn"), col("_u")).as("_m"))
      val large = sym.join(lsMin, "_u")
        .filter(col("_v") > col("_u"))
        .select(col("_v").as("_u"), col("_m").as("_v"))
        .distinct()
      // small-star: u's smaller neighborhood (ALL of `large`'s edges, by
      // orientation) plus u itself re-attach to its min
      val ssMin = large.groupBy("_u").agg(min("_v").as("_m"))
      val small = large.join(ssMin, "_u")
      val next = small.select(col("_u"), col("_m").as("_v"))
        .union(small.select(col("_v").as("_u"), col("_m").as("_v")))
        .filter(col("_u") =!= col("_v"))
        .distinct()
        .localCheckpoint(true)
      // fixed point = edge set unchanged (both sets are canonical, so a
      // plain set difference is exact); limit(1) stops at first witness
      changed = next.join(cur, Seq("_u", "_v"), "left_anti").limit(1).count() +
        cur.join(next, Seq("_u", "_v"), "left_anti").limit(1).count()
      cur = next
      i += 1
    }
    require(changed == 0, s"not converged after $maxIter rounds")
    // fixed point is a star forest: _v is the component min for every _u.
    // Output universe = nodes ∪ edge endpoints — the SAME row set
    // minLabel emits (it seeds labels from exactly this union), so the
    // two same-contract variants are interchangeable; joining `nodes`
    // alone would silently drop endpoints absent from it
    val roots = cur.select(col("_u").as("_id"), col("_v").as("_lbl"))
    val universe = nodes.select(col(idCol).as("_id"))
      .union(edges.select(col(srcCol).as("_id")))
      .union(edges.select(col(dstCol).as("_id")))
      .distinct()
    universe
      .join(roots, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_lbl"), col("_id")).as("cluster"))
  }
}
