package graft

import org.apache.spark.sql.functions._
import graft.ops.SaltedJoin

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows carry key 1 (the hot key)
    val large = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "dim_val")

    val plain = large.join(small, "k")
    val salted = SaltedJoin(large, small, "k", saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotOnly salting equals plain join on skewed data") {
    val large = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "dim_val")
    val plain = large.join(small, "k")
    val salted = SaltedJoin.hotOnly(large, small, "k", saltFactor = 8, hotThreshold = 500L)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotOnly replicates the small side only for hot keys") {
    val large = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "dim_val")
    // reproduce the internal replication: hot key 1 → 8 copies, cold → 1
    val hotKeys = large.groupBy("k").count()
      .filter(col("count") > 500L).select(col("k"), lit(true).as("_hot"))
    assert(hotKeys.count() == 1, "exactly one hot key in this fixture")
    val replicated = small.join(broadcast(hotKeys), Seq("k"), "left")
      .withColumn("_salt",
        explode(when(col("_hot"), sequence(lit(0L), lit(7L))).otherwise(array(lit(0L)))))
    // 99 cold keys × 1 + 1 hot key × 8 = 107 (vs 800 for all-keys salting)
    assert(replicated.count() == 107)
  }

  test("hotOnly on uniform data degenerates to an unsalted join (no replication)") {
    val large = spark.range(1000)
      .select((col("id") % 100).as("k"), col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "dim_val")
    // every key has 10 rows — below threshold, nothing is hot
    val salted = SaltedJoin.hotOnly(large, small, "k", saltFactor = 8, hotThreshold = 500L)
    val plain = large.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads the hot key across many partitions") {
    val large = spark.range(8000).select(lit(1L).as("k"), col("id").as("payload"))
      .repartition(8)
    val small = Seq((1L, "hot")).toDF("k", "dim_val")
    val parts = SaltedJoin(large, small, "k", saltFactor = 8)
      .repartition(col("k"), col("payload") * 0) // no-op reshuffle guard
    // the pre-drop salted frame: verify ≥ 2 distinct salts actually occur
    val salts = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts >= 2, "salting must spread the hot key")
    assert(parts.count() == 8000)
  }
}
