package graft

import org.apache.spark.sql.functions._
import graft.functions.Features

/** Features.registerSql's contract: ALL FOUR SQL functions exist and
  * compute exactly what the Column builders compute — including the
  * masking fail-closed branch for '@'-less "emails".
  */
class FeatureSqlSpec extends SparkSpec {
  import spark.implicits._

  test("all four SQL functions match their Column builders row for row") {
    Features.registerSql(spark)
    val df = Seq(
      (30L, 2L, 10L, 123456L, "Customer#000000042", "jane.doe@example.com"),
      (400L, 0L, 300L, 0L, "Al", "johnsmith1975"), // '@'-less: must fail CLOSED
      (1000L, 50L, 0L, 99999999L, "Customer#000000007", "a@b.co"),
      (2000L, 7L, 45L, 500L, "Zo", "x@y.z"))
      .toDF("days", "purchases", "recency", "spend_cents", "name", "email")
      .withColumn("events", col("days"))
    df.createOrReplaceTempView("feat_in")
    val viaSql = spark.sql("""
      SELECT age_bucket(CAST(days AS INT)) AS b, mask_name(name) AS mn,
             mask_email(email) AS me,
             engagement_score(events, purchases, recency, spend_cents) AS es
      FROM feat_in""").collect()
    val viaCol = df.select(
      Features.ageBucket(col("days")).as("b"),
      Features.maskName(col("name")).as("mn"),
      Features.maskEmail(col("email")).as("me"),
      Features.engagementScore(col("events"), col("purchases"),
        col("recency"), col("spend_cents")).as("es")).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s == c, s"SQL/Column divergence: $s vs $c")
    }
    // the fail-closed branch: no fragment of the '@'-less value beyond
    // its first character may survive masking
    val masked = viaCol(1).getAs[String]("me")
    assert(masked == "j***", s"'@'-less input must mask fully closed: $masked")
  }
}
