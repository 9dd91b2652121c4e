package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a `factor`× corpus from a driver testdata dir into a
  * scratch dir, for MEASURING the pair-forming family's scaling
  * exponents (SCALE.md §"Measured scaling") instead of arguing them
  * from plan shapes.
  *
  * Replication must hold DUPLICATE DENSITY constant or the measurement
  * is garbage: naive copies would make every replica a near-dup of its
  * original, growing pair OUTPUT quadratically in the factor and
  * measuring output size, not algorithm scaling. So each replica is
  * perturbed to be similar WITHIN itself exactly like the original is,
  * and dissimilar to every other replica:
  *
  *  - documents: replica r applies a Caesar cipher (letters rotated by
  *    r) — a 1:1 token map, so shingles/minhash/winnow/jaccard structure
  *    inside the replica is EXACTLY the original corpus's, while tokens
  *    across replicas share (almost) nothing. Sources keep their names:
  *    every source grows `factor`×, the harder blocking regime.
  *  - embeddings: replica r rolls dimensions by 7r and flips signs by a
  *    deterministic per-(r, dim) parity — an orthogonal transform, so
  *    norms and within-replica cosines are bit-preserved while
  *    cross-replica cosines collapse toward 0. Replica vec_ids are
  *    ≡ 1 (mod 10) and labels ≥ 1000, so the e1/e2/e4/e5 QUERY sets
  *    stay the original corpus's — query volume is a workload knob, not
  *    a corpus property, and holding it fixed is what makes "cost ∝
  *    corpus" measurable.
  *
  * Ids offset by r·10¹² — collision-free against any driver-generated
  * id space.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    generate(spark, src, out, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    // factor 27+ would give replica 26 a rot-0 (IDENTITY) cipher — a
    // verbatim corpus copy, silently breaking the constant-density
    // invariant this tool exists to enforce
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (Caesar rotations repeat at 26): $factor")
    writeDocs(spark, src, out, factor)
    writeEmbeddings(spark, src, out, factor)
    writeRelational(spark, src, out, factor)
    println(s"""{"scale_corpus":"$out","factor":$factor,"docs":${
      spark.read.parquet(s"$out/documents.parquet").count()},"vecs":${
      spark.read.parquet(s"$out/embeddings.parquet").count()},"lines":${
      spark.read.parquet(s"$out/lineitem.parquet").count()}}""")
  }

  /** factor-N relational tables for measuring the JOIN/WINDOW/AGG
    * family. Facts and GROWING dims (customer, orders, lineitem,
    * events) replicate with keys offset by r·10¹² — per-customer order
    * counts, per-order line counts, and per-user event traces keep the
    * original distribution exactly, so both scaling regimes are
    * preserved: per-key groups (a1's customer profiles, w3's user
    * sessions) grow in COUNT at constant size, while fixed-dim groups
    * (a4's brand×month cells, w8's per-part rank windows) grow in SIZE
    * at constant count. FIXED dims (part, supplier, nation, region)
    * copy verbatim — the 100 TB shape: facts grow, dims don't, and the
    * a4/j4 dim broadcasts must stay broadcasts at every factor. */
  private def writeRelational(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def off(r: Int) = lit(r.toLong * 1000000000000L)
    def replicate(table: String, keyCols: Seq[String]): Unit = {
      // events MUST go through Tables.events: its ts physical type has
      // shipped in two generations (TIMESTAMP(NANOS) needs nanosAsLong
      // before the schema read or the scan throws; see normalizeEventTs)
      // — a raw parquet read would crash on the older generation. The
      // normalized session-zoned ts is cast BACK to NTZ before writing
      // (a pure type change under the pinned UTC session) so the scale
      // corpus keeps the driver testdata's physical type — a zoned
      // TIMESTAMP(isAdjustedToUTC) column would make DuckDB read the
      // replica's ts as TIMESTAMPTZ and break every ts-emitting oracle
      // run against it
      val base =
        if (table == "events")
          graft.core.Tables.events(spark, src)
            .withColumn("ts", col("ts").cast("timestamp_ntz"))
        else spark.read.parquet(s"$src/$table.parquet")
      (0 until factor).map { r =>
        if (r == 0) base
        else base.select(base.columns.map { c =>
          if (keyCols.contains(c)) (col(c) + off(r)).as(c) else col(c)
        }.toIndexedSeq: _*)
      }.reduce(_ unionByName _)
        .repartition(factor * 2)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey")) // l_partkey/l_suppkey: fixed dims
    replicate("events", Seq("event_id", "user_id"))
    Seq("part", "supplier", "nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  private def writeDocs(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val replicas = (0 until factor).map { r =>
      if (r == 0) docs
      else {
        val rotL = Lower.drop(r % 26) + Lower.take(r % 26)
        val rotU = rotL.toUpperCase
        docs.select(
          // SAME id transform as the embeddings replicas (r·10¹² +
          // id·10 + 1), so a replica document still matches its replica
          // vector — metadata-filtered vector search (e12) sees the
          // corpus grow ∝ factor instead of a constant base slice. The
          // transform is order-preserving within a replica, so
          // id-canonical pair election (d12/t26) is unaffected.
          (lit(r.toLong * 1000000000000L) + col("doc_id") * 10 + 1).as("doc_id"),
          translate(col("text"), Lower + Upper, rotL + rotU).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }
    replicas.reduce(_ unionByName _)
      .repartition(factor * 4)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private def writeEmbeddings(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val vecs = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = 64
    val replicas = (0 until factor).map { r =>
      if (r == 0) vecs
      else {
        val rolled = array((0 until dim).map { i =>
          val srcIdx = (i + 7 * r) % dim
          val sign =
            if (graft.functions.TextFunctions.portableHash60(s"sg:$r:$i") % 2 == 0) 1.0f
            else -1.0f
          (element_at(col("embedding"), srcIdx + 1) * lit(sign)).cast("float")
        }: _*)
        vecs.select(
          // ≡ 1 (mod 10): never an e2/e4/e5 query; labels ≥ 1000: never
          // an e1 query — the query set stays the original corpus's
          (lit(r.toLong * 1000000000000L) + col("vec_id") * 10 + 1).as("vec_id"),
          rolled.as("embedding"),
          (col("label") + lit(1000 * r)).as("label"))
      }
    }
    replicas.reduce(_ unionByName _)
      .repartition(factor * 2)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
