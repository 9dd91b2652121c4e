package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable scalar feature / masking functions (reference: SQL UDFs
  * `age_bucket`, `engagement_score` in feature_store.py:127-162 and masking
  * functions in governance/access_control.py:112-143).
  *
  * Implemented as plain Column builders — pure Catalyst expression trees,
  * fully codegen'd and pushdown-transparent, never JVM UDFs (SURVEY.md
  * §2.10: no custom Expression needed for parity). Each also registers an
  * equivalent SQL function via [[registerSql]] so `spark.sql` queries can
  * call them by name.
  */
object Features {

  /** Bucket an age-in-days into lifecycle bands. */
  def ageBucket(days: Column): Column =
    when(days < 180, "new")
      .when(days < 720, "active")
      .when(days < 1800, "established")
      .otherwise("veteran")

  /** Weighted engagement score: activity, conversion, recency, value.
    * 0.2*min(events,100) + 0.3*min(10*purchases,100)
    * + 0.3*max(100 - 0.5*recency, 0) + 0.2*min(spend/10000, 100),
    * computed exactly in integer 1e-4 units (spend passed in cents) so the
    * result is float-rounding-free and engine-independent.
    */
  def engagementScore(
      events: Column, purchases: Column, recencyDays: Column, spendCents: Column): Column =
    (least(events, lit(100L)) * 2000L +
      least(purchases * 10L, lit(100L)) * 3000L +
      greatest(lit(300000L) - recencyDays * 1500L, lit(0L)) +
      least(floor(spendCents / 500L).cast("long"), lit(200000L)))
      .cast("double") / 10000.0

  /** Mask all but the first `keep` chars of an identifier. */
  def maskName(name: Column, keep: Int = 10): Column =
    concat(substring(name, 1, keep), lit("***"))

  /** Mask the local part of an email, keep the domain. substring_index,
    * not element_at(split(..), 2): under Spark 4's default ANSI mode an
    * out-of-range element_at THROWS, so one '@'-less malformed value
    * would abort the whole masking job instead of masking it. And a
    * malformed value must fail CLOSED: substring_index(x, '@', -1) on
    * an '@'-less input returns the WHOLE string — emitting the full raw
    * identifier as the "domain" — so the no-'@' branch masks everything
    * past the first character instead. */
  def maskEmail(email: Column): Column =
    when(email.contains("@"),
      concat(substring(email, 1, 1), lit("***@"), substring_index(email, "@", -1)))
      .otherwise(concat(substring(email, 1, 1), lit("***")))

  /** Register ALL FOUR builders as SQL functions on the session (the
    * reference's CREATE FUNCTION surface) — bodies mirror the Column
    * builders expression for expression; FeatureSqlSpec pins the
    * equality. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION age_bucket(days INT)
      RETURNS STRING RETURN CASE WHEN days < 180 THEN 'new'
        WHEN days < 720 THEN 'active' WHEN days < 1800 THEN 'established'
        ELSE 'veteran' END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION mask_name(name STRING)
      RETURNS STRING RETURN concat(substring(name, 1, 10), '***')""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION mask_email(email STRING)
      RETURNS STRING RETURN CASE WHEN email LIKE '%@%'
        THEN concat(substring(email, 1, 1), '***@', substring_index(email, '@', -1))
        ELSE concat(substring(email, 1, 1), '***') END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION engagement_score(
        events BIGINT, purchases BIGINT, recency_days BIGINT, spend_cents BIGINT)
      RETURNS DOUBLE RETURN CAST(
        least(events, 100) * 2000 + least(purchases * 10, 100) * 3000
        + greatest(300000 - recency_days * 1500, 0)
        + least(CAST(floor(spend_cents / 500) AS BIGINT), 200000)
        AS DOUBLE) / 10000.0""")
  }
}
