package graft

import org.apache.spark.sql.functions._
import graft.model.{Event, Typed}

/** Typed Dataset surface: encoders bind the testdata schemas, and typed
  * transforms agree with the equivalent DataFrame ops.
  */
class TypedModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("encoders bind all three entity schemas") {
    assert(Typed.customers(spark, sf).head().c_custkey >= 0)
    assert(Typed.orders(spark, sf).head().o_totalprice > 0)
    assert(Typed.events(spark, sf).head().event_id >= 0)
  }

  test("typed filter/groupByKey agrees with the DataFrame path") {
    val typed = Typed.events(spark, sf)
      .filter((e: Event) => e.event_type == "purchase")
      .groupByKey(_.user_id)
      .count()
      .collect().toMap
    val df = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(typed == df)
  }

  test("typed semantic op: per-customer spend via typed aggregation") {
    val spend = Typed.orders(spark, sf)
      .groupByKey(_.o_custkey)
      .mapValues(o => BigDecimal(o.o_totalprice).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .reduceGroups(_ + _)
      .map { case (k, v) => (k, v.toDouble) }
      .collect().toMap
    val df = graft.core.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(graft.queries.Exact.moneySum("o_totalprice").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(spend.keySet == df.keySet)
    spend.foreach { case (k, v) => assert(math.abs(v - df(k)) < 1e-6) }
  }
}
