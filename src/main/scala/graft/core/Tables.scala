package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Design note for 100 TB: every loader returns a plain parquet scan so
  * Catalyst predicate pushdown / column pruning reach the file source
  * (`PushedFilters` / `ReadSchema` in explain). At cluster scale these
  * paths would be partitioned directories (e.g. orders by o_orderdate
  * month) — the query code below never assumes a single file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical representations across
    * testdata generations: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader surfaces as a nanos-since-epoch long under
    * `nanosAsLong` — and parquet TIMESTAMP(MICROS) without timezone,
    * which Spark reads natively as TIMESTAMP_NTZ. Normalize either to a
    * session-zoned TimestampType column holding the same microsecond
    * instant (the session is pinned to UTC, so the NTZ cast is a pure
    * type change), matching what DuckDB sees on the same file.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      // the generator has changed ts's physical type once already; a
      // THIRD representation must fail loudly at load time, not surface
      // as downstream oracle hash mismatches
      case other => sys.error(
        s"events.ts: unhandled physical type $other — " +
          "testdata generation changed again; extend normalizeEventTs")
    }
  }

  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Local-parallelism shim for single-file scans: spread a small
    * one-split table across the session's cores (`defaultParallelism`,
    * never a baked-in count — on a 1000-executor cluster this follows
    * the cluster, on local[5] it follows local[5]). Conditional: a real
    * multi-split 100 TB scan already yields >= defaultParallelism
    * partitions and passes through untouched — the exchange exists only
    * where a one-file test input would serialize a CPU-heavy pipeline
    * (signature computation, vector math). Results are partition-count
    * invariant (the local[5] sweep gates that), so skipping the
    * repartition never changes output. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // scan-shaped probe: df.inputFiles is a listing, where df.rdd would
    // physically PLAN the frame just to read a partition count (and,
    // applied mid-pipeline under AQE, could even execute upstream
    // stages for the probe). spread's callers apply it directly on table
    // loads, where "few input files" IS the under-parallelism being
    // fixed; a single large well-split file pays one redundant (cheap,
    // rare) repartition rather than every caller paying a re-plan.
    val files = df.inputFiles.length
    if (files == 0 || files >= p) df else df.repartition(p)
  }

  /** Injected "as of" clock (SURVEY.md §7.4.3): all recency/freshness math
    * uses these fixed instants instead of wall-clock so the DuckDB oracle
    * hash-matches deterministically. Orders span 1995-01-01..2001-08-01;
    * events span 2024-01-01..2024-01-30.
    */
  val OrdersAsOf = "2001-09-01 00:00:00"
  val EventsAsOf = "2024-02-01 00:00:00"
}
