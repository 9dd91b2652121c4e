package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles

/** Closed-form graphs for the degree-ordered triangle enumeration: the
  * per-node participation counts are exact integers, so every case pins
  * literal values (no tolerance), and the hub case exercises the
  * orientation that bounds wedge fan-out under skew.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    edges.foreach { case (a, b) => assert(a < b, s"fixture edge must be a<b: ($a,$b)") }
    Triangles.participation(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: four triangles, every vertex in exactly three") {
    val got = run(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
  }

  test("wheel on 5 rim nodes: hub in all five, each rim node in two") {
    val hub = 10L
    val rim = Seq(1L, 2L, 3L, 4L, 5L)
    val spokes = rim.map(r => r -> hub) // rim ids < hub id
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 1L -> 5L)
    val got = run(spokes ++ cycle)
    assert(got(hub) == 5L, s"hub: $got")
    rim.foreach(r => assert(got(r) == 2L, s"rim $r: $got"))
  }

  test("triangle-free graphs yield no rows: path and star") {
    assert(run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)).isEmpty)
    assert(run(Seq(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L)).isEmpty)
  }

  test("two triangles sharing an edge: shared endpoints count both") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val got = run(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), got.toString)
  }

  test("counts are partitioning-invariant (exact integers, any layout)") {
    val edges = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L if (a + b) % 3 != 0
    } yield (a, b)).toSeq
    val one = Triangles.participation(edges.toDF("a", "b").repartition(1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Triangles.participation(edges.toDF("a", "b").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
    assert(one.nonEmpty)
  }
}
