package graft

import org.apache.spark.sql.functions._
import graft.ops.PageRank

/** Closed-form and determinism pins for the integer micro-rank PageRank
  * (ops/PageRank.scala). The star-graph values are hand-computed from the
  * exact update rule r' = 150000 + (85 · Σ (r·w div ow)) div 100, so any
  * drift in the arithmetic (a double sneaking in, a changed damping
  * split) breaks an exact assert, not a tolerance.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def star = {
    // spokes 1..4 ↔ hub 9, unit weights (hub out-weight 4, spokes 1)
    val out = (1 to 4).map(s => (s.toLong, 9L, 1L))
    val back = (1 to 4).map(s => (9L, s.toLong, 1L))
    (out ++ back).toDF("src", "dst", "w")
  }

  test("star graph matches the hand-computed exact fixpoint steps") {
    // iter1: hub = 150000 + 85%·(4·1e6) = 3550000
    //        spoke = 150000 + 85%·(1e6 div 4) = 362500
    // iter2: hub = 150000 + 85%·(4·362500) = 1382500
    //        spoke = 150000 + 85%·(3550000 div 4) = 904375
    val r1 = PageRank.run(star, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(9L) == 3550000L && (1 to 4).forall(s => r1(s.toLong) == 362500L),
      s"iteration 1: $r1")
    val r2 = PageRank.run(star, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(9L) == 1382500L && (1 to 4).forall(s => r2(s.toLong) == 904375L),
      s"iteration 2: $r2")
  }

  test("ranks are bit-identical under any partitioning (exact long arithmetic)") {
    val a = PageRank.run(star.repartition(7), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(star.repartition(1), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"partitioning changed exact ranks: $a vs $b")
  }

  test("total rank stays within the damped conservation envelope") {
    // every node ≥ base 150000; total ≤ N·1e6 (mass only leaks via
    // floor truncation and damping, never grows)
    val r = PageRank.run(star, iterations = 4)
      .collect().map(_.getLong(1))
    assert(r.forall(_ >= 150000L), s"below damping base: ${r.toSeq}")
    assert(r.sum <= 5L * 1000000L, s"rank mass grew: ${r.sum}")
  }

  test("null or non-positive edge weight raises loudly") {
    val bad = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      PageRank.run(bad, iterations = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("fractional edge weight raises loudly instead of truncating to 0") {
    // w = 0.5 passes the w <= 0 check but would silently zero the edge
    // under cast("long") — the guard must bind the post-cast value too
    val bad = Seq((1L, 2L, 0.5), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      PageRank.run(bad, iterations = 1).collect()
    }
    assert(Option(ex.getMessage).exists(_.contains("non-integral")) ||
      Option(ex.getCause).exists(c => Option(c.getMessage).exists(_.contains("non-integral"))),
      s"expected the non-integral raise, got: $ex")
    // integral-valued DOUBLES are fine (1.0 == 1L) — the guard rejects
    // fractional values, not the double type
    val ok = Seq((1L, 2L, 1.0), (2L, 1L, 2.0)).toDF("src", "dst", "w")
    assert(PageRank.run(ok, iterations = 1).count() == 2L)
  }
}
