package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.silver.Transforms

/** The reference's own unit-test cases (tests/test_silver_transforms.py,
  * tests/test_quality_rules.py, local_testing.py integration invariants —
  * FIXTURES.md §B), reproduced against our transforms.
  */
class SilverTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("B1: email/name standardization — case, padding, null preserved") {
    val df = Seq(
      ("C-001", "  John.DOE@Example.COM ", "  john", "DOE  "),
      ("C-002", null, "mary", "ann smith"))
      .toDF("customer_id", "email", "first_name", "last_name")
    val out = Transforms.standardizeCustomer(df).orderBy("customer_id").collect()
    assert(out(0).getAs[String]("email") == "john.doe@example.com")
    assert(out(0).getAs[String]("full_name") == "John Doe")
    assert(out(1).getAs[String]("email") == null)
    assert(out(1).getAs[String]("full_name") == "Mary Ann Smith")
  }

  test("B2: amount math — 100/0.10→90, 200/0.25→150, discount 1.5 clamps to 0") {
    val df = Seq(
      ("T1", 100.0, 0.10), ("T2", 200.0, 0.25), ("T3", 50.0, 1.5), ("T4", -10.0, 0.0))
      .toDF("transaction_id", "amount", "discount_pct")
    val out = Transforms.computeAmounts(df).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("net_amount")).toMap
    assert(out("T1") == 90.0)
    assert(out("T2") == 150.0)
    assert(out("T3") == 50.0) // clamped discount → full amount
    assert(out("T4") == -10.0)
  }

  test("B3: latest-wins dedup — 3 versions of C-001, newest email wins") {
    val df = Seq(
      ("C-001", "old@x.com", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("C-001", "mid@x.com", Timestamp.valueOf("2024-02-01 00:00:00")),
      ("C-001", "new@x.com", Timestamp.valueOf("2024-03-01 00:00:00")),
      ("C-002", "only@x.com", Timestamp.valueOf("2024-01-15 00:00:00")))
      .toDF("customer_id", "email", "updated_date")
    val out = graft.ops.Dedup
      .latestWins(df, Seq("customer_id"), Seq(col("updated_date")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("C-001" -> "new@x.com", "C-002" -> "only@x.com"))
  }

  test("B4: loyalty-tier validation — invalid, PREMIUM, and null → unknown") {
    val df = Seq(("C1", "gold"), ("C2", "PREMIUM"), ("C3", "Silver"), ("C4", null))
      .toDF("customer_id", "loyalty_tier")
    val out = Transforms.validateTier(df).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("C1" -> "gold", "C2" -> "unknown", "C3" -> "silver", "C4" -> "unknown"))
  }

  test("B5: combined drop rules keep 2 of 6; quarantine carries reason") {
    import graft.quality.Quality
    val df = Seq(
      (Some("T1"), Some(50.0)), (Some("T2"), Some(250000.0)), (None, Some(10.0)),
      (Some("T4"), Some(-5.0)), (Some("T5"), Some(0.0)), (Some("T6"), Some(99.0)))
      .toDF("transaction_id", "amount")
    val res = Quality.apply(df, Seq(
      Quality.Rule("id_present", "transaction_id IS NOT NULL", Quality.Drop),
      Quality.Rule("amount_positive", "amount > 0", Quality.Drop),
      Quality.Rule("amount_reasonable", "amount < 100000", Quality.Quarantine)))
    assert(res.clean.count() == 2) // T1 and T6
    val q = res.quarantined.collect()
    assert(q.length == 1 && q(0).getAs[String]("quarantine_reason") == "amount_reasonable")
  }

  test("B6: CDC apply — preimages skipped, latest op wins, deletes soft-deleted") {
    val df = Seq(
      ("TK1", "open", "insert", 1L),
      ("TK1", "open", "update_preimage", 2L),
      ("TK1", "closed", "update_postimage", 2L),
      ("TK2", "open", "insert", 1L),
      ("TK2", "open", "delete", 3L),
      ("TK3", "open", "insert", 5L),
      ("TK3", "open", "insert", 4L)) // out-of-order duplicate
      .toDF("ticket_id", "status", "cdc_operation", "cdc_version")
    val out = Transforms.applyCdc(df, "ticket_id", "cdc_operation", Seq("cdc_version"))
      .collect().map(r => r.getString(0) -> r.getAs[String]("status")).toMap
    assert(out == Map("TK1" -> "closed", "TK2" -> "deleted", "TK3" -> "open"))
  }

  test("B9: integration invariants on testdata — gold ⊆ silver keys, revenue non-negative") {
    val sf = "/root/testdata/sf0.001"
    val gold = SparkEntry.queries("j1_customer_360")(spark, sf)
    val custKeys = graft.core.Tables.customer(spark, sf).select("c_custkey")
    assert(gold.select("c_custkey").except(custKeys).isEmpty)
    assert(gold.filter(col("total_spend") < 0).count() == 0)
    val nullRate = gold.filter(col("c_mktsegment").isNull).count().toDouble / gold.count()
    assert(nullRate <= 0.05)
  }
}
