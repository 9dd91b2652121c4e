package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.maint.VersionedTable
import graft.ops.IncrementalAgg

/** Incremental materialized-view maintenance: folding change-feed batches
  * into a (count, sum) aggregate must equal a full recompute of the final
  * snapshot — across multiple chained versions with inserts, updates
  * (value changes), and deletes, including groups that vanish entirely.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: Seq[(Long, String, Double)]) =
    rows.toDF("id", "grp", "amount")

  test("chained change-feed deltas converge to the full recompute") {
    val t = new VersionedTable(
      spark, Files.createTempDirectory("graft_mv_").toString + "/t")
    val v0 = snap(Seq(
      (1L, "a", 10.00), (2L, "a", 20.00), (3L, "b", 5.50), (4L, "c", 7.25)))
    val v1 = snap(Seq( // update 1, delete 2, insert 5; c untouched
      (1L, "a", 11.00), (3L, "b", 5.50), (4L, "c", 7.25), (5L, "b", 2.25)))
    val v2 = snap(Seq( // delete all of group b; move 4 to group a
      (1L, "a", 11.00), (4L, "a", 7.25)))
    t.writeWithChangeFeed(v0, Seq("id"))
    t.writeWithChangeFeed(v1, Seq("id"))
    t.writeWithChangeFeed(v2, Seq("id"))

    var state = IncrementalAgg.init(t.read(Some(0)), Seq("grp"), "amount")
    Seq(1L, 2L).foreach { v =>
      val feed = t.changeFeed(fromVersion = v)
        .filter(col("_commit_version") === v)
      state = IncrementalAgg.applyDelta(state, feed, Seq("grp"), "amount")
    }
    val got = state
      .select(col("grp"), col("cnt"), col("agg_sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = IncrementalAgg.init(t.read(Some(2)), Seq("grp"), "amount")
      .select(col("grp"), col("cnt"), col("agg_sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"incremental $got != recompute $want")
    // group b must have dropped out entirely (cnt reached zero)
    assert(!got.exists(_._1 == "b"))
  }

  test("random version chains converge for any mix of churn (seeded)") {
    val rnd = new scala.util.Random(42)
    def randomSnap(): Seq[(Long, String, Double)] =
      (1L to 40L).flatMap { id =>
        if (rnd.nextDouble() < 0.7) // 30%: key absent (delete/never inserted)
          Some((id, s"g${rnd.nextInt(5)}", rnd.nextInt(10000) / 100.0))
        else None
      }
    val t = new VersionedTable(
      spark, Files.createTempDirectory("graft_mv3_").toString + "/t")
    val nVersions = 5
    (0 until nVersions).foreach(_ => t.writeWithChangeFeed(snap(randomSnap()), Seq("id")))
    var state = IncrementalAgg.init(t.read(Some(0)), Seq("grp"), "amount")
    (1 until nVersions).foreach { v =>
      state = IncrementalAgg.applyDelta(
        state,
        t.changeFeed(v.toLong).filter(col("_commit_version") === v.toLong),
        Seq("grp"), "amount")
    }
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("grp"), col("cnt"), col("agg_sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(norm(state) ==
      norm(IncrementalAgg.init(t.read(Some(nVersions - 1L)), Seq("grp"), "amount")))
  }

  test("min/max maintenance: clean groups stay algebraic, dirty groups recompute") {
    val t = new VersionedTable(
      spark, Files.createTempDirectory("graft_mvmm_").toString + "/t")
    val v0 = snap(Seq(
      (1L, "a", 10.00), (2L, "a", 20.00), (3L, "a", 15.00),
      (4L, "b", 5.00), (5L, "b", 9.00), (6L, "c", 7.00)))
    // a: delete current MIN (dirty); b: delete interior row via update of
    // another (clean-ish mix); c: inserts only (clean); d: new group
    val v1 = snap(Seq(
      (2L, "a", 20.00), (3L, "a", 15.00),
      (4L, "b", 5.00), (5L, "b", 6.50),
      (6L, "c", 7.00), (7L, "c", 3.00), (8L, "d", 1.00)))
    t.writeWithChangeFeed(v0, Seq("id"))
    t.writeWithChangeFeed(v1, Seq("id"))
    val state = IncrementalAgg.applyDeltaMinMax(
      IncrementalAgg.initMinMax(t.read(Some(0)), Seq("grp"), "amount"),
      t.changeFeed(fromVersion = 1), Seq("grp"), "amount",
      base = t.read(Some(1)))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("grp"), col("cnt"),
        col("agg_min").cast("double"), col("agg_max").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val want = norm(IncrementalAgg.initMinMax(t.read(Some(1)), Seq("grp"), "amount"))
    assert(norm(state) == want, s"${norm(state)} != $want")
  }

  test("min/max maintenance converges on random churn incl. vanishing groups") {
    val rnd = new scala.util.Random(7)
    def randomSnap(): Seq[(Long, String, Double)] =
      (1L to 40L).flatMap { id =>
        if (rnd.nextDouble() < 0.6)
          Some((id, s"g${rnd.nextInt(4)}", rnd.nextInt(10000) / 100.0))
        else None
      }
    val t = new VersionedTable(
      spark, Files.createTempDirectory("graft_mvmm2_").toString + "/t")
    val n = 5
    (0 until n).foreach(_ => t.writeWithChangeFeed(snap(randomSnap()), Seq("id")))
    var state = IncrementalAgg.initMinMax(t.read(Some(0)), Seq("grp"), "amount")
    (1 until n).foreach { v =>
      state = IncrementalAgg.applyDeltaMinMax(
        state,
        t.changeFeed(v.toLong).filter(col("_commit_version") === v.toLong),
        Seq("grp"), "amount", base = t.read(Some(v.toLong)))
    }
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("grp"), col("cnt"),
        col("agg_min").cast("double"), col("agg_max").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(norm(state) ==
      norm(IncrementalAgg.initMinMax(t.read(Some(n - 1L)), Seq("grp"), "amount")))
  }

  test("an update's count deltas cancel; only the sum moves") {
    val t = new VersionedTable(
      spark, Files.createTempDirectory("graft_mv2_").toString + "/t")
    t.writeWithChangeFeed(snap(Seq((1L, "a", 10.00), (2L, "a", 1.00))), Seq("id"))
    t.writeWithChangeFeed(snap(Seq((1L, "a", 12.50), (2L, "a", 1.00))), Seq("id"))
    val state = IncrementalAgg.applyDelta(
      IncrementalAgg.init(t.read(Some(0)), Seq("grp"), "amount"),
      t.changeFeed(fromVersion = 1), Seq("grp"), "amount")
    val r = state.select(col("cnt"), col("agg_sum").cast("double")).collect()(0)
    assert(r.getLong(0) == 2L && r.getDouble(1) == 13.50)
  }

  test("sum NULL-ness is maintained exactly: all-NULL groups stay NULL, and return to NULL") {
    // SQL sum over zero non-null values is NULL, not 0 — the maintained
    // state must preserve that through deltas that never touch the group
    // AND restore it when a delete removes the group's last real value
    import graft.ops.ChangeFeed
    val s0 = Seq(
      ("g", Option(5.0)), ("g", Option.empty[Double]),
      ("h", Option.empty[Double]), ("h", Option.empty[Double]))
      .toDF("grp", "amount")
    val state0 = IncrementalAgg.init(s0, Seq("grp"), "amount")
    def sumOf(st: org.apache.spark.sql.DataFrame, g: String): Option[Double] =
      st.filter(col("grp") === g).select(col("agg_sum").cast("double"))
        .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(sumOf(state0, "h").isEmpty, "init must leave an all-NULL group's sum NULL")

    // delta touching only g: h's NULL sum must survive untouched
    val feed1 = Seq(("g", Option(5.0), "delete"), ("h", Option(2.0), "insert"))
      .toDF("grp", "amount", ChangeFeed.ChangeTypeCol)
    val state1 = IncrementalAgg.applyDelta(state0, feed1, Seq("grp"), "amount")
    assert(sumOf(state1, "g").isEmpty,
      "deleting g's only real value must take its sum back to NULL, not 0.00")
    assert(sumOf(state1, "h").contains(2.0))

    // deleting h's one real value: back to NULL, like a recompute
    val feed2 = Seq(("h", Option(2.0), "delete"))
      .toDF("grp", "amount", ChangeFeed.ChangeTypeCol)
    val state2 = IncrementalAgg.applyDelta(state1, feed2, Seq("grp"), "amount")
    assert(sumOf(state2, "h").isEmpty,
      "h's sum must return to NULL when its last real value deletes")
    assert(state2.filter(col("grp") === "h").select("cnt")
      .collect()(0).getLong(0) == 2L)
  }
}
