package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** The native sorted_intersect must equal array_intersect on its contract
  * inputs (sorted long arrays; result ascending + deduped), and stay
  * inside whole-stage codegen.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect equals array_intersect on random sorted distinct arrays") {
    val rnd = new Random(19)
    val rows = (1 to 500).map { i =>
      (i.toLong,
        rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(80)).distinct.sorted.toArray,
        rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(80)).distinct.sorted.toArray)
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      call_function("sorted_intersect", $"a", $"b").as("native"),
      array_intersect($"a", $"b").as("generic"))
    assert(cmp.filter(not($"native" <=> $"generic")).count() == 0)
  }

  test("sorted_intersect edge cases: empty, disjoint, identical, duplicates") {
    val df = Seq(
      (1L, Array.empty[Long], Array(1L, 2L)),
      (2L, Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (3L, Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      // duplicates collapse, like array_intersect
      (4L, Array(1L, 1L, 2L, 2L, 3L), Array(1L, 2L, 2L, 4L)))
      .toDF("id", "a", "b")
    val got = df.select($"id",
      call_function("sorted_intersect", $"a", $"b").as("x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got(1L) == Nil)
    assert(got(2L) == Nil)
    assert(got(3L) == List(1L, 2L, 3L))
    assert(got(4L) == List(1L, 2L))
  }

  test("sorted_intersect null arrays yield null; stays in codegen") {
    val base = spark.range(100).select(
      sequence($"id", $"id" + 5).as("a"),
      sequence($"id" + 3, $"id" + 8).as("b"))
    val res = base.select(
      call_function("sorted_intersect", $"a", $"b").as("native"),
      array_intersect($"a", $"b").as("generic"))
    assert(res.filter(not($"native" <=> $"generic")).count() == 0)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("sorted_intersect"))
    assert(plan.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined)
    val nulls = Seq((Option.empty[Array[Long]], Some(Array(1L)))).toDF("a", "b")
      .select(call_function("sorted_intersect", $"a", $"b").as("x")).collect()
    assert(nulls(0).isNullAt(0))
  }
}
