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

  /** JSON scan with schema enforcement + rescue column + ingest metadata. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_rescued_data", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_rescued_data")
      .json(path)
      .withColumn("_ingest_file", col("_metadata.file_path"))
      .withColumn("_ingested_at", col("_metadata.file_modification_time"))

  /** CSV scan: header, custom delimiter, nulls, rescue, metadata. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", nullValue: String = ""): DataFrame =
    spark.read
      .schema(schema.add("_rescued_data", "string"))
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
