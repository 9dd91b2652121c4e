package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ops.KMeans

/** Convergence and structural invariants for the ops/KMeans kernel (the
  * e6 query path is oracle-checked; these cover the multi-round loop).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def randomVectors(n: Int, dim: Int, seed: Int) = {
    val rnd = new Random(seed)
    (0L until n.toLong).map(id => (id, Array.fill(dim)(rnd.nextFloat() * 4f - 2f)))
      .toDF("vec_id", "embedding")
  }

  test("Lloyd rounds never increase the SSE objective (up to micro quantization)") {
    val v = randomVectors(300, 8, seed = 3).repartition(7).localCheckpoint(true)
    var c = KMeans.seedCentroids(v, 6).localCheckpoint(true)
    var prev = KMeans.sse(v, c)
    (1 to 4).foreach { round =>
      c = KMeans.centroidsFrom(KMeans.updateMicro(KMeans.assign(v, c)))
        .localCheckpoint(true)
      val cur = KMeans.sse(v, c)
      // exact means can only lower SSE; the 1e-6 component quantization
      // and double summation order get a small absolute allowance
      assert(cur <= prev * (1 + 1e-9) + 1e-3,
        s"round $round: SSE rose $prev -> $cur")
      prev = cur
    }
  }

  test("assignRunnerUp: closed-form distances and d1 <= d2 on planted geometry") {
    // seeds = two lowest ids: (0,0) and (10,0); every squared distance
    // below is an exactly-representable integer, so equality is exact
    val v = Seq(
      (1L, Array(0f, 0f)),
      (2L, Array(10f, 0f)),
      (3L, Array(1f, 0f)),
      (4L, Array(4f, 0f))).toDF("vec_id", "embedding")
    val got = KMeans.assignRunnerUp(v, KMeans.seedCentroids(v, 2))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 0.0, 100.0)), s"seed 1: ${got(1L)}")
    assert(got(2L) == ((2L, 0.0, 100.0)), s"seed 2: ${got(2L)}")
    assert(got(3L) == ((1L, 1.0, 81.0)), s"near point: ${got(3L)}")
    assert(got(4L) == ((1L, 16.0, 36.0)), s"mid point: ${got(4L)}")
    assert(got.values.forall { case (_, d1, d2) => d1 <= d2 },
      s"runner-up invariant violated: $got")
  }

  test("assignRunnerUp raises loudly on a single-centroid set") {
    val v = randomVectors(10, 4, seed = 9)
    val e = intercept[Exception] {
      KMeans.assignRunnerUp(v, KMeans.seedCentroids(v, 1)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("fewer than 2"),
      s"expected the loud runner-up guard, got: $msgs")
  }

  test("sse on an empty vectors frame is 0.0, not an NPE") {
    val v = randomVectors(10, 4, seed = 5)
    val c = KMeans.seedCentroids(v, 2)
    assert(KMeans.sse(v.filter(col("vec_id") < 0), c) == 0.0)
  }

  test("fit on real testdata keeps centroid count and dimensionality") {
    val v = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val c = KMeans.fit(v, k = 5, iters = 3)
    val rows = c.collect()
    assert(rows.nonEmpty && rows.length <= 5,
      s"expected 1..5 centroids, got ${rows.length}")
    // cluster ids can only be (a subset of) the original seed ids
    val seedIds = v.orderBy(col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(seedIds))
    rows.foreach { r =>
      assert(r.getSeq[Double](1).length == graft.queries.Embeddings.EmbDim,
        "centroids must keep the embedding dimensionality")
    }
  }

  test("centroidsFrom inverts updateMicro with dimensions in order") {
    val assigned = Seq((1L, 0L, 0.0, Array(1f, 2f, 3f)),
      (2L, 0L, 0.0, Array(3f, 4f, 5f)))
      .toDF("vec_id", "cluster_id", "dist", "embedding")
    val c = KMeans.centroidsFrom(KMeans.updateMicro(assigned)).collect()
    assert(c.length == 1)
    assert(c(0).getLong(0) == 0L)
    assert(c(0).getSeq[Double](1) == Seq(2.0, 3.0, 4.0))
  }
}
