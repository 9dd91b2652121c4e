package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive behind cluster-balanced corpus sampling and SemDeDup-style
  * curation (queries e6/d8). Shaped for Spark's execution model:
  *
  *  - ALL k centroids ride ONE broadcast row (a struct array sorted by
  *    cid), so assignment is a row-local fold — the corpus is never
  *    shuffled, at any corpus size. A groupBy-argmin formulation would
  *    exchange a full vector per row; `.explain` on the first cut showed
  *    exactly that, which is why this is a fold.
  *  - The update step floor-scales each component to integer micros
  *    BEFORE summing, so the cross-member sum is integer — deterministic
  *    under any partitioning or merge order — and the mean is one double
  *    division from exact integers. The only shuffle per round is this
  *    (cluster, dim)-keyed exchange of longs, partial-aggregated to
  *    k·dim rows per task.
  *  - Iterating is one k-row localCheckpoint per round (the same k-row
  *    driver-side footprint MLlib's own KMeans pays), keeping the plan
  *    shallow however many rounds run.
  *
  * Seeds are the k lowest vec_ids: deterministic and scale-portable —
  * swap in k-means|| sampling at real scale without touching the loop.
  * Expects columns `vec_id` (long) and `embedding` (float/double array).
  */
object KMeans {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.dotCol(a, b)

  /** ONE packed broadcast row of all centroids (cid-sorted struct array)
    * — the shared scaffolding of both assignment folds. */
  private def packedCentroids(centroids: DataFrame): DataFrame =
    broadcast(centroids.agg(sort_array(collect_list(
      struct(col("cid"), col("ce")))).as("cs")))

  /** Squared-L2 distance of the current row's embedding to one packed
    * centroid struct — THE distance form; both folds must share it or
    * their tie semantics could silently fork. Expects the precomputed
    * `vv` self-dot column. */
  private def distToPacked(c: Column): Column =
    col("vv") -
      lit(2.0) * dot(col("embedding"), c.getField("ce")) +
      dot(c.getField("ce"), c.getField("ce"))

  /** The shared loud-guard on a fold's surviving cid = -1 init: NO
    * centroid produced a comparable distance — a ragged embedding
    * (vec_dot returns null on length mismatch) or an empty centroid
    * set. Fail LOUDLY (the e8/ANSI-abort posture): letting cid=-1
    * through would materialize a phantom centroid from the ragged rows
    * on the next update and poison every later round with
    * sse=Infinity, silently. Cheap scalar compare on the folded field
    * — no shared-subexpression/CSE hazard. */
  private def guardedCid(cid: Column, who: String): Column =
    when(cid === -1L, raise_error(lit(
      s"KMeans.$who: no centroid comparable for this vector " +
        "(ragged embedding dims or empty centroid set)")))
      .otherwise(cid)

  /** k deterministic seed centroids (`cid`, `ce`) = the k lowest vec_ids. */
  def seedCentroids(vectors: DataFrame, k: Int): DataFrame =
    vectors.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** Assign every vector to its nearest centroid (squared L2; distance
    * tie → lowest cid, because the struct array is sorted by cid and the
    * fold keeps the first strict minimum). Zero-shuffle: the corpus
    * streams through one broadcast-nested-loop join against a single
    * packed centroid row. Output: vec_id, cluster_id, dist, embedding. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(packedCentroids(centroids))
      .withColumn("vv", dot(col("embedding"), col("embedding")))
      .withColumn("m", aggregate(
        col("cs"),
        struct(lit(Double.PositiveInfinity).as("dist"), lit(-1L).as("cid")),
        (acc, c) => {
          val dist = distToPacked(c)
          when(dist < acc.getField("dist"),
            struct(dist.as("dist"), c.getField("cid").as("cid")))
            .otherwise(acc)
        }))
      .select(col("vec_id"),
        guardedCid(col("m.cid"), "assign").as("cluster_id"),
        col("m.dist").as("dist"), col("embedding"))

  /** [[assign]] plus the runner-up distance — the nearest OTHER centroid
    * — for silhouette-style separation metrics (query e9). Same
    * zero-shuffle broadcast fold and tie semantics (distance tie →
    * lowest cid: the struct array is cid-sorted and only a STRICT
    * improvement displaces a slot; a displaced best becomes the
    * runner-up). Invariant dist <= dist2 by construction — the fold
    * only ever admits into d2 what failed to beat d1. Raises loudly if
    * fewer than 2 centroids were comparable for a vector. Output:
    * vec_id, cluster_id, dist, dist2. */
  def assignRunnerUp(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(packedCentroids(centroids))
      .withColumn("vv", dot(col("embedding"), col("embedding")))
      .withColumn("m", aggregate(
        col("cs"),
        struct(lit(Double.PositiveInfinity).as("d1"), lit(-1L).as("cid"),
          lit(Double.PositiveInfinity).as("d2")),
        (acc, c) => {
          val dist = distToPacked(c)
          when(dist < acc.getField("d1"),
            struct(dist.as("d1"), c.getField("cid").as("cid"),
              acc.getField("d1").as("d2")))
            .when(dist < acc.getField("d2"),
              struct(acc.getField("d1").as("d1"), acc.getField("cid").as("cid"),
                dist.as("d2")))
            .otherwise(acc)
        }))
      .select(col("vec_id"),
        guardedCid(col("m.cid"), "assignRunnerUp").as("cluster_id"),
        col("m.d1").as("dist"),
        // a runner-up that never materialized (ONE comparable centroid:
        // k=1 seeds, or k=2 with one ragged centroid) would flow NaN/
        // ANSI-cast failures into a silhouette consumer while the
        // oracle's rn=2 join just drops the row — a silent divergence.
        // Same loud posture as the cid guard.
        when(col("m.d2") === Double.PositiveInfinity, raise_error(lit(
          "KMeans.assignRunnerUp: fewer than 2 comparable centroids " +
            "for this vector")))
          .otherwise(col("m.d2")).as("dist2"))

  /** Centroid update from integer-micro component sums — deterministic
    * under any partitioning. Output one row per (cluster_id, dim):
    * n_members, sum_micro, and the new mean c_val. */
  def updateMicro(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster_id"), posexplode(col("embedding")))
      .select(col("cluster_id"), col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * 1000000.0).cast("long").as("micro"))
      .groupBy("cluster_id", "dim")
      .agg(count(lit(1)).as("n_members"), sum(col("micro")).as("sum_micro"))
      .withColumn("c_val",
        col("sum_micro").cast("double") /
          (col("n_members").cast("double") * 1000000.0))

  /** Reassemble (`cid`, `ce`) centroid rows from an [[updateMicro]]
    * result. Clusters that lost every member simply produce no row. */
  def centroidsFrom(update: DataFrame): DataFrame =
    update.groupBy("cluster_id")
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("c_val")))),
        s => s.getField("c_val")).as("ce"))
      .select(col("cluster_id").as("cid"), col("ce"))

  /** `iters` full Lloyd rounds from the k-lowest-id seeds. Each round's
    * centroids are k rows, eagerly checkpointed so the plan never deepens
    * with the iteration count. */
  def fit(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    var c = seedCentroids(vectors, k).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      c = centroidsFrom(updateMicro(assign(vectors, c))).localCheckpoint(true)
      i += 1
    }
    c
  }

  /** Within-cluster sum of squared distances — the Lloyd objective.
    * Plain double sum: summation order is partition-dependent at ulp
    * scale, so compare with a tolerance, never for equality. */
  def sse(vectors: DataFrame, centroids: DataFrame): Double =
    assign(vectors, centroids)
      .agg(coalesce(sum(col("dist")), lit(0.0)).as("sse")) // empty input → 0, not a SQL NULL NPE
      .collect()(0).getDouble(0)
}
