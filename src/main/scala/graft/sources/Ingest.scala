package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion readers (SURVEY.md §2.1 S1/S2/S3: Auto-Loader-shaped JSON /
  * CSV / parquet scans with explicit schema, malformed-row rescue, and
  * ingest metadata columns — the OSS file-source equivalent of the
  * reference's cloudFiles options, ingest_crm_customers.py:107-117,
  * ingest_transactions.py:52-81).
  *
  * Rescue parity: PERMISSIVE mode + columnNameOfCorruptRecord captures
  * unparseable rows in `_rescued_data` instead of failing the batch.
  * Metadata parity: `_metadata.file_path` / file_modification_time come
  * from the file source's metadata column.
  */
object Ingest {

  /** The three columns these readers add. A caller schema already using
    * one would either produce a duplicate-field StructType (ambiguous-
    * reference errors far from the cause) or be SILENTLY overwritten by
    * withColumn — the Quality/ZOrder reserved-name posture applies. */
  private def requireUnreserved(schema: StructType): StructType = {
    val reserved = Set("_rescued_data", "_ingest_file", "_ingested_at")
    val clash = schema.fieldNames.filter(reserved)
    require(clash.isEmpty,
      s"Ingest reserves ${reserved.mkString(", ")}; caller schema " +
        s"must not contain: ${clash.mkString(", ")}")
    schema
  }

  /** JSON scan with schema enforcement + rescue column + ingest metadata. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(requireUnreserved(schema).add("_rescued_data", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_rescued_data")
      .json(path)
      .withColumn("_ingest_file", col("_metadata.file_path"))
      .withColumn("_ingested_at", col("_metadata.file_modification_time"))

  /** CSV scan: header, custom delimiter, nulls, rescue, metadata. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", nullValue: String = ""): DataFrame =
    spark.read
      .schema(requireUnreserved(schema).add("_rescued_data", "string"))
      .option("header", "true")
      .option("sep", delimiter)
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_rescued_data")
      .csv(path)
      .withColumn("_ingest_file", col("_metadata.file_path"))
      .withColumn("_ingested_at", col("_metadata.file_modification_time"))

  /** S12: per-entity JSON export (the DSAR shape) — one directory per
    * partition value. */
  def exportJson(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).json(path)
}
