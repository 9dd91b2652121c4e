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
  * (dup clusters are dense). At 100 TB the same loop runs with the
  * large-star/small-star optimization (alternating conditional joins that
  * contract paths in O(log n) rounds, Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14); the per-round shape —
  * join labels to edges, min-aggregate — is identical.
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
    var labels = nodes.select(col(idCol).as("_id"), col(idCol).as("_lbl"))
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
}
