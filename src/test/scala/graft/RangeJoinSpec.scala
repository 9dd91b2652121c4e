package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bin-bucketed interval join must equal the naive BETWEEN join on every
  * edge the binning could mishandle: intervals shorter than a bin, longer
  * than several bins, points exactly on interval bounds, and bin-boundary
  * straddles.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("equals the naive cross-join filter on random intervals across bin widths") {
    val rnd = new scala.util.Random(77)
    val points = (1 to 300).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(400))))
    }.toDF("pt_id", "d")
    val intervals = (1 to 40).map { i =>
      val s = java.time.LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(380))
      (i.toLong, java.sql.Date.valueOf(s),
        java.sql.Date.valueOf(s.plusDays(rnd.nextInt(90)))) // lengths 0..89 days
    }.toDF("iv_id", "start_d", "end_d")
    val naive = points.crossJoin(intervals)
      .filter(col("d") >= col("start_d") && col("d") <= col("end_d"))
      .select("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (binDays <- Seq(1, 7, 30, 365)) {
      val got = RangeJoin.pointInInterval(points, "d", intervals, "start_d", "end_d", binDays)
        .select("pt_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binDays=$binDays: ${(got diff naive).take(3)} extra, " +
        s"${(naive diff got).take(3)} missing")
    }
  }

  test("inclusive bounds: points exactly on start and end match; outside-by-one do not") {
    val points = Seq(
      (1L, java.sql.Date.valueOf("2020-03-09")),
      (2L, java.sql.Date.valueOf("2020-03-10")),
      (3L, java.sql.Date.valueOf("2020-03-20")),
      (4L, java.sql.Date.valueOf("2020-03-21"))).toDF("pt_id", "d")
    val iv = Seq((9L, java.sql.Date.valueOf("2020-03-10"), java.sql.Date.valueOf("2020-03-20")))
      .toDF("iv_id", "start_d", "end_d")
    val got = RangeJoin.pointInInterval(points, "d", iv, "start_d", "end_d", binDays = 7)
      .select("pt_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("intervalOverlap equals the naive overlap filter, duplicate-free, across bin widths") {
    val rnd = new scala.util.Random(101)
    def ivs(n: Int, tag: String) = (1 to n).map { i =>
      val s = java.time.LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(300))
      (i.toLong, java.sql.Date.valueOf(s),
        java.sql.Date.valueOf(s.plusDays(rnd.nextInt(60)))) // lengths 0..59 days
    }.toDF(s"${tag}_id", s"${tag}_start", s"${tag}_end")
    val a = ivs(35, "a")
    val b = ivs(25, "b")
    val naive = a.crossJoin(b)
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty, "fixture must produce overlaps")
    // binDays=1 makes long overlaps span MANY shared bins — the
    // canonical-bin rule must still emit each pair exactly once
    for (binDays <- Seq(1, 7, 30, 365)) {
      val got = RangeJoin.intervalOverlap(a, "a_start", "a_end",
          b, "b_start", "b_end", binDays)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size,
        s"binDays=$binDays emitted duplicate pairs")
      assert(got.toSet == naive.toSet,
        s"binDays=$binDays: ${(got.toSet diff naive.toSet).take(3)} extra, " +
          s"${(naive.toSet diff got.toSet).take(3)} missing")
    }
  }

  test("intervalOverlap inclusive bounds: touching endpoints overlap, one-day gaps do not") {
    val a = Seq((1L, java.sql.Date.valueOf("2020-03-10"), java.sql.Date.valueOf("2020-03-20")))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (1L, java.sql.Date.valueOf("2020-03-01"), java.sql.Date.valueOf("2020-03-09")), // gap
      (2L, java.sql.Date.valueOf("2020-03-01"), java.sql.Date.valueOf("2020-03-10")), // touches start
      (3L, java.sql.Date.valueOf("2020-03-20"), java.sql.Date.valueOf("2020-03-25")), // touches end
      (4L, java.sql.Date.valueOf("2020-03-21"), java.sql.Date.valueOf("2020-03-25"))) // gap
      .toDF("b_id", "b_start", "b_end")
    val got = RangeJoin.intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end", 7)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("j13 plans an equi-join (hash/sort-merge), not a nested-loop join") {
    val p = SparkEntry.queries("j13_session_overlap_campaigns")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join degenerated to a nested loop:\n$p")
  }

  test("j12 plans an equi-join (hash/sort-merge), not a nested-loop join") {
    val p = SparkEntry.queries("j12_range_join_campaigns")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("Join") || p.contains("join"), s"no join in plan:\n$p")
  }
}
