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
}
