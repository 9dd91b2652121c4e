package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

/** Cluster-resolution semantics: planted components must collapse to their
  * min id, singletons stay themselves, and chains converge (worst-case
  * diameter for label propagation).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("planted clusters resolve to min-id labels; singletons survive") {
    // components: {1,2,3} via 1-2, 2-3; {10,11}; singleton 99
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val got = ConnectedComponents.minLabel(edges, "a", "b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("a long chain converges (diameter-bound rounds)") {
    val n = 15
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val got = ConnectedComponents.minLabel(edges, "a", "b", nodes, "id", maxIter = n + 1)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L), "whole chain must collapse to label 0")
  }

  test("alternatingStar: planted clusters resolve exactly like minLabel") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val got = ConnectedComponents.alternatingStar(edges, "a", "b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("alternatingStar equals minLabel on random graphs (and needs fewer rounds on chains)") {
    // property check across seeds: sparse random graphs with singletons,
    // chains (worst case for label propagation), and dense pockets
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 4) {
      val n = 60 + trial * 20
      val ids = (0 until n).map(_.toLong)
      val es = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      // random sparse edges
      (1 to n / 2).foreach { _ =>
        es += ((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      }
      // a chain segment — diameter stress
      val base = rnd.nextInt(n - 12)
      (0 until 10).foreach(i => es += ((base + i.toLong, base + i + 1L)))
      val edges = es.toSeq.toDF("a", "b")
      val nodes = ids.toDF("id")
      val byProp = ConnectedComponents.minLabel(edges, "a", "b", nodes, "id", maxIter = 40)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStar = ConnectedComponents.alternatingStar(edges, "a", "b", nodes, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byStar == byProp, s"trial $trial: star/propagation disagree: " +
        s"${(byStar.toSet -- byProp.toSet).take(5)} vs ${(byProp.toSet -- byStar.toSet).take(5)}")
    }
  }

  test("alternatingStar converges on a long chain in far fewer than diameter rounds") {
    // 63-node chain: label propagation needs ~62 rounds; path contraction
    // must land well inside 20 (the O(log d) bound this variant exists for)
    val n = 63
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val got = ConnectedComponents.alternatingStar(edges, "a", "b", nodes, "id", maxIter = 20)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(0L), "whole chain must collapse to label 0")
  }

  test("edge endpoints missing from the node set still label correctly") {
    // an endpoint absent from `nodes` must still contribute its id to the
    // label pool — minLabel and alternatingStar must agree on it
    val edges = Seq((5L, 3L)).toDF("src", "dst")
    val nodes = Seq(5L).toDF("id")
    val viaMin = ConnectedComponents.minLabel(edges, "src", "dst", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMin.get(5L).contains(3L),
      s"node 5 must take the missing endpoint's smaller id 3: $viaMin")
    val viaStar = ConnectedComponents.alternatingStar(edges, "src", "dst", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar.get(5L) == viaMin.get(5L), "the two variants must agree")
  }

  test("non-convergence within maxIter is an error, not a wrong answer") {
    val edges = (0 until 9).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val nodes = (0 until 10).map(_.toLong).toDF("id")
    intercept[IllegalArgumentException] {
      ConnectedComponents.minLabel(edges, "a", "b", nodes, "id", maxIter = 2)
    }
  }
}
