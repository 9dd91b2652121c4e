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

  test("j12 plans an equi-join (hash/sort-merge), not a nested-loop join") {
    val p = SparkEntry.queries("j12_range_join_campaigns")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("Join") || p.contains("join"), s"no join in plan:\n$p")
  }
}
