package graft

import org.apache.spark.sql.functions._
import graft.ml.ChurnModel
import graft.quality.PiiScan

/** Parity-optional surfaces: PII discovery (F4) and ML churn training
  * (§2.13) — plus CACHE/ANALYZE maintenance (M8/M9).
  */
class MlAndPiiSpec extends SparkSpec {
  import spark.implicits._

  test("PiiScan flags PII-shaped column names and sampled values") {
    val df = Seq(
      ("alice", "alice@example.com", "+1 (555) 123-4567", 12.0),
      ("bob", "bob@test.org", "555 987 6543", 5.0))
      .toDF("first_name", "contact", "contact_phone", "balance")
    val findings = PiiScan.scan(df)
    val kinds = findings.map(f => f.column -> f.kind).toSet
    assert(kinds.contains("first_name" -> "name"))
    assert(kinds.contains("contact_phone" -> "phone"))
    assert(kinds.contains("contact" -> "email"), s"got $findings")
    assert(!findings.exists(_.column == "balance"))
  }

  test("PiiScan phone gate: dates never report, date-prefixed phones do") {
    // the round-9 gate semantics: EVERY date shape is stripped from a
    // match before the >= 9-digit phone test, so bare dates and runs of
    // consecutive dates (16 digits across two dates!) stay silent while
    // a phone captured behind a date prefix still reports
    def kindsOf(values: Seq[String]): Set[String] = {
      val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "freetext")
      PiiScan.scan(df).filter(_.column == "freetext").map(_.kind).toSet
    }
    assert(!kindsOf(Seq("2024-01-01")).contains("phone"),
      "a bare ISO date is not a phone")
    assert(!kindsOf(Seq("2024-01-01 2024-01-02 2024-01-03")).contains("phone"),
      "consecutive dates must not sum their digits into a phone")
    assert(kindsOf(Seq("2024-01-01 555 867 5309 x2")).contains("phone"),
      "a genuine phone behind a date-shaped prefix must report")
    assert(kindsOf(Seq("+1 (555) 123-4567")).contains("phone"))
    // round-10 boundary semantics: a date INSIDE a longer digit/dash run
    // is phone material (never stripped), while a dash-joined date RANGE
    // is one chained date match (stripped, rejected)
    assert(kindsOf(Seq("555-1234-56-78 90")).contains("phone"),
      "a date shape embedded in a phone run must not strip its digits")
    assert(!kindsOf(Seq("2024-01-01-2024-01-31")).contains("phone"),
      "a compact dash-joined date range is not a phone")
  }

  test("churn model trains on the cf1 features and separates the planted signal") {
    val feats = SparkEntry.queries("cf1_churn_features")(spark, "/root/testdata/sf0.001")
    val trained = ChurnModel.train(
      feats,
      Seq("frequency", "monetary", "recency_days", "event_cnt", "error_cnt",
        "days_dormant", "freq_capped"),
      labelCol = "churn_risk")
    // churn_risk is a deterministic function of two features — the trees
    // must learn it near-perfectly on held-out rows. Both the RF and the
    // GBT (the two models the reference trains and compares) must train.
    assert(trained.models.map(_.name).toSet == Set("random_forest", "gbt"))
    trained.models.foreach { m =>
      assert(m.aucRoc > 0.9, s"${m.name} AUC ${m.aucRoc}")
      assert(m.featureImportances.values.sum > 0.99, s"${m.name} importances")
    }
    assert(trained.aucRoc == trained.models.map(_.aucRoc).max)
  }

  test("CACHE TABLE and ANALYZE TABLE statistics (M8/M9)") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders_v")
    spark.sql("CACHE TABLE orders_v")
    assert(spark.catalog.isCached("orders_v"))
    assert(spark.table("orders_v").count() == 1500)
    spark.sql("UNCACHE TABLE orders_v")
    assert(!spark.catalog.isCached("orders_v"))
  }

  test("ANALYZE TABLE computes catalog statistics (M8)") {
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode("overwrite").saveAsTable("nation_stats_t")
    spark.sql("ANALYZE TABLE nation_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    val stats = spark.sql("DESCRIBE EXTENDED nation_stats_t n_nationkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("distinct_count").exists(_.toLong >= 25L))
    val tableStats = spark.sql("DESCRIBE EXTENDED nation_stats_t")
      .filter(col("col_name") === "Statistics").collect()
    assert(tableStats.nonEmpty && tableStats(0).getString(1).contains("rows"))
    spark.sql("DROP TABLE nation_stats_t")
  }
}
