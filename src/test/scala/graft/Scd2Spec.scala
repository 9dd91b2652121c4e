package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD2 invariants (SURVEY.md §7.4.1): exactly one current row per key,
  * intervals chain without gaps or overlaps, no-op changes collapse, and
  * applyUpdates agrees with a fromHistory rebuild.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def history = Seq(
    // key, ts, value
    (1L, "2020-01-01", "bronze"),
    (1L, "2020-06-01", "silver"),
    (1L, "2020-09-01", "silver"), // no-op change — must collapse
    (1L, "2021-01-01", "gold"),
    (2L, "2020-03-01", "bronze"))
    .toDF("k", "ts_s", "v")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("fromHistory: intervals chain, one current per key, no-ops collapsed") {
    val scd = Scd2.fromHistory(history, "k", "ts", "v").cache()
    // one current row per key
    val currents = scd.filter(col("is_current")).groupBy("k").count().collect()
    assert(currents.forall(_.getLong(1) == 1L))
    // key 1: three versions (silver no-op collapsed)
    assert(scd.filter(col("k") === 1L).count() == 3)
    // intervals chain: each non-current end == next start
    val k1 = scd.filter(col("k") === 1L).orderBy("effective_start").collect()
    k1.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[java.sql.Timestamp]("effective_end") ==
          b.getAs[java.sql.Timestamp]("effective_start"))
      case _ =>
    }
    assert(k1.last.getAs[java.sql.Timestamp]("effective_end") == null)
    assert(k1.map(_.getAs[String]("v")).toSeq == Seq("bronze", "silver", "gold"))
  }

  test("applyUpdates: changed key closes + inserts; unchanged untouched; new key appears") {
    val current = Scd2.fromHistory(history, "k", "ts", "v")
    val updates = Seq(
      (1L, "2022-01-01", "platinum"), // change for key 1
      (2L, "2022-01-01", "bronze"),   // no-op for key 2
      (3L, "2022-01-01", "silver"))   // brand-new key
      .toDF("k", "ts_s", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val merged = Scd2.applyUpdates(current, updates, "k", "ts", "v").cache()

    val currents = merged.filter(col("is_current"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("v")).toMap
    assert(currents == Map(1L -> "platinum", 2L -> "bronze", 3L -> "silver"))
    // key 1 old current row is closed at the update ts
    val closedGold = merged.filter(col("k") === 1L && col("v") === "gold").collect()(0)
    assert(closedGold.getAs[java.sql.Timestamp]("effective_end").toString.startsWith("2022-01-01"))
    assert(!closedGold.getAs[Boolean]("is_current"))
    // key 2 history untouched (1 row, still current)
    assert(merged.filter(col("k") === 2L).count() == 1)
    // one current per key still holds
    val perKey = merged.filter(col("is_current")).groupBy("k").count().collect()
    assert(perKey.forall(_.getLong(1) == 1L))
  }

  test("applyUpdates replay is idempotent") {
    val current = Scd2.fromHistory(history, "k", "ts", "v")
    val updates = Seq((1L, "2022-01-01", "platinum"))
      .toDF("k", "ts_s", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val once = Scd2.applyUpdates(current, updates, "k", "ts", "v")
    val twice = Scd2.applyUpdates(once, updates, "k", "ts", "v")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("NULL tracked values: transitions to/from NULL version correctly; one current per key") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // history: a -> NULL -> NULL (collapse) -> a  — the NULL period must
    // appear as its own version, consecutive NULLs must collapse
    val changes = Seq(
      (1L, t("2024-01-01 00:00:00"), Option("a")),
      (1L, t("2024-02-01 00:00:00"), Option.empty[String]),
      (1L, t("2024-03-01 00:00:00"), Option.empty[String]),
      (1L, t("2024-04-01 00:00:00"), Option("a"))).toDF("k", "ts", "v")
    val hist = Scd2.fromHistory(changes, "k", "ts", "v").orderBy("effective_start")
    val vals = hist.collect().map(r => Option(r.getString(1))).toSeq
    assert(vals == Seq(Some("a"), None, Some("a")),
      s"expected a -> NULL -> a versions, got $vals")
    assert(hist.filter(col("is_current")).count() == 1)

    // applyUpdates: a NULL-valued current row + a real update must close
    // the NULL row, leaving exactly one current row
    val current = Seq((1L, Option.empty[String],
      t("2024-01-01 00:00:00"), Option.empty[Timestamp], true))
      .toDF("k", "v", "effective_start", "effective_end", "is_current")
    val upd = Seq((1L, Option("x"), t("2024-05-01 00:00:00"))).toDF("k", "v", "ts")
    val out = Scd2.applyUpdates(current, upd, "k", "ts", "v")
    assert(out.filter(col("is_current")).count() == 1,
      "NULL current + update must leave exactly one current row")
    assert(out.filter(col("is_current")).collect()(0).getString(1) == "x")
    // and an update TO NULL closes a non-null current row the same way
    val current2 = Seq((2L, Option("a"),
      t("2024-01-01 00:00:00"), Option.empty[Timestamp], true))
      .toDF("k", "v", "effective_start", "effective_end", "is_current")
    val updNull = Seq((2L, Option.empty[String], t("2024-06-01 00:00:00")))
      .toDF("k", "v", "ts")
    val out2 = Scd2.applyUpdates(current2, updNull, "k", "ts", "v")
    assert(out2.filter(col("is_current")).count() == 1)
    assert(out2.filter(col("is_current")).collect()(0).isNullAt(1))
  }

  test("stale updates (ts not after current start) are ignored, never inverted") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val current = Seq((1L, "a", t("2024-05-01 00:00:00"), Option.empty[Timestamp], true))
      .toDF("k", "v", "effective_start", "effective_end", "is_current")
    val stale = Seq((1L, "b", t("2024-01-01 00:00:00"))).toDF("k", "v", "ts")
    val out = Scd2.applyUpdates(current, stale, "k", "ts", "v")
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getString(1) == "a" && rows(0).getBoolean(4),
      "a stale update must leave the current row untouched")
  }
}
