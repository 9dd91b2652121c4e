package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver-layer standardization transforms (reference:
  * src/silver/transform_customers.py:84-123, transform_transactions.py:
  * 54-91, transform_support_tickets.py:42-147 — the exact expressions the
  * reference unit-tests in tests/test_silver_transforms.py).
  *
  * All row-local column expressions — codegen'd, shuffle-free; the dedup /
  * CDC compositions reuse the shared ops (one key-shuffle each).
  */
object Transforms {

  /** Email/name standardization: lower+trim email (nulls preserved),
    * initcap names, concat_ws full name. */
  def standardizeCustomer(df: DataFrame): DataFrame =
    df.withColumn("email", lower(trim(col("email"))))
      .withColumn("first_name", initcap(trim(col("first_name"))))
      .withColumn("last_name", initcap(trim(col("last_name"))))
      .withColumn("full_name", concat_ws(" ", col("first_name"), col("last_name")))

  /** Amount math: clamp discount outside [0,1] to 0, derive gross/
    * discount/net. */
  def computeAmounts(df: DataFrame): DataFrame =
    df.withColumn("discount_pct",
        when(col("discount_pct").between(0.0, 1.0), col("discount_pct"))
          .otherwise(0.0))
      .withColumn("gross_amount", col("amount"))
      .withColumn("discount_amount", col("amount") * col("discount_pct"))
      .withColumn("net_amount", col("amount") * (lit(1.0) - col("discount_pct")))

  /** Domain validation: unknown/null tier → "unknown". */
  def validateTier(df: DataFrame, valid: Seq[String] = Seq("bronze", "silver", "gold", "platinum")): DataFrame =
    df.withColumn("loyalty_tier",
      when(lower(col("loyalty_tier")).isin(valid: _*), lower(col("loyalty_tier")))
        .otherwise("unknown"))

  /** CDC apply with preimage skip + soft delete (ST11/J7): keep the latest
    * op per key, drop update_preimage rows, mark deletes status='deleted'. */
  def applyCdc(changes: DataFrame, key: String, opCol: String,
      versionCols: Seq[String]): DataFrame = {
    val ops = changes.filter(col(opCol) =!= "update_preimage")
    val latest = graft.ops.Dedup.latestWins(ops, Seq(key), versionCols.map(col))
    latest.withColumn("status",
      when(col(opCol) === "delete", "deleted").otherwise(col("status")))
  }
}
