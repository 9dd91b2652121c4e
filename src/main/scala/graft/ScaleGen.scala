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

  // ------------------------------------------------------------- skew

  /** Deterministic per-row selector in [0, m): full-key xxhash64 — the
    * SaltedJoin.rowSalt rationale (stable under task recompute). */
  private def pick(m: Int, cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64(cols: _*), lit(m.toLong))

  /** Skew knobs — deterministic, and sized so the skewed corpus CROSSES
    * the engine's own skew thresholds (Dedup.HotBucketRows = 256 for the
    * salted bucket joins, Dedup.WinnowMaxDf = 1000 for the df cap,
    * Graph.BasketCap = 64 for the basket pair build) instead of sitting
    * politely under them. */
  private[graft] val HotCustomerOrderPct = 1   // % of ALL orders → one customer
  private[graft] val HotPartLinePct      = 2   // % of ALL lineitems → one part
  private[graft] val MegaBasketPerMille  = 1   // ‰ of lineitems → one order
  private[graft] val HotUserEventPct     = 2   // % of ALL events → one user
  private[graft] val BoilerTierAPct      = 20  // % of docs sharing ONE boilerplate
  private[graft] val BoilerVariants      = 12  // tier-B variant count
  private[graft] val BoilerTierBPct      = 12  // % of docs spread over the variants
  private[graft] val BoilerFrac          = 0.55 // prefix fraction replaced
  /** ~1/3 of non-centroid vectors re-aimed at ONE centroid's direction
    * (pick-modulus 100/33 = 3), breaking the N/k_cent uniform-cell
    * assumption e4/e12/t30/e14's probe-cost model rests on. */
  private[graft] val HotCellVecPct       = 33
  /** Direction blend for re-aimed vectors: v' ∝ (1−λ)·v̂ + λ·ĉ, then
    * rescaled to the ORIGINAL norm — cos(v', ĉ) ≈ λ, far above any
    * random centroid, so the whole selected mass assigns to the hot
    * cell; norms (and thus every normalization, validation, and e1
    * scoring cost) are preserved. */
  private[graft] val HotCellBlend        = 0.85

  /** Boilerplate text for variant v, tiled to at least `minLen` chars:
    * synthetic tokens disjoint from the organic vocabulary, so injected
    * shingles/fingerprints collide only across docs sharing the SAME
    * boilerplate — the license-header / template regime the d12 df cap
    * and d3 hot-bucket salting exist for. The caller sizes `minLen` to
    * cover [[BoilerFrac]] × the longest document; a too-short literal
    * would silently SHORTEN long docs (substr(boiler, 1, plen) returns
    * fewer than plen chars) and break the identical-volume invariant
    * the skew measurement rests on — writeSkewed asserts the cover. */
  private[graft] def boilerText(v: Int, minLen: Int = 700): String = {
    val unit = (0 until 90).map(i => s"zb${v}w${i % 30}").mkString(" ") + " "
    val reps = minLen / unit.length + 1
    (unit * reps).trim
  }

  /** Zipf-skewed twin of a uniform corpus at IDENTICAL volume: every
    * table keeps its exact row count (documents additionally their exact
    * text lengths); only the key/content DISTRIBUTION changes — so a
    * uniform-vs-skewed wall-time ratio measures skew handling, never
    * data size. Reads a [[generate]] output (or a driver testdata dir)
    * and injects:
    *
    *  - orders: [[HotCustomerOrderPct]]% of ALL orders reassigned to the
    *    single smallest customer key — "one customer owns 1% of the
    *    business" (the a1/a4/j1/j2 join+agg skew regime).
    *  - lineitem: [[HotPartLinePct]]% of rows reassigned to the smallest
    *    part key (one SKU dominates — w8's per-part rank window and j2's
    *    enrich join see a ~2%-of-fact hot key), and [[MegaBasketPerMille]]‰
    *    of rows reassigned to the smallest order key (one adversarial
    *    mega-basket — the C(k,2) fan-out Graph.BasketCap bounds).
    *  - documents: [[BoilerTierAPct]]% get ONE shared boilerplate prefix
    *    ([[BoilerFrac]] of their length — hot d3 band buckets, and
    *    winnow fingerprints with df far above Dedup.WinnowMaxDf,
    *    exercising the cap); [[BoilerTierBPct]]% split evenly across
    *    [[BoilerVariants]] variant boilerplates sized to land each
    *    variant's fingerprint df inside Dedup's (HotBucketRows,
    *    WinnowMaxDf] salting band. Prefix REPLACEMENT, not prepend:
    *    lengths (and the n_chars column) stay truthful.
    *  - events: [[HotUserEventPct]]% of rows reassigned to the smallest
    *    user id — the STREAMING-state hot key (st9's
    *    flatMapGroupsWithState drains one key carrying 2% of the corpus
    *    through a single group iterator; w1/w2/w3's per-user windows
    *    get the same hot partition).
    *
    * Hot keys are the smallest existing key of each table, so no foreign
    * key breaks. Embeddings get the hot-IVF-cell treatment (a third of
    * the vector mass re-aimed at one centroid, norms preserved — see the
    * embeddings block below). The remaining tables (customer, part,
    * supplier, nation, region) copy through verbatim.
    */
  def writeSkewed(spark: SparkSession, src: String, out: String): Unit = {
    def minKey(table: String, k: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(min(col(k)).cast("long")).head().getLong(0)
    val hotCust = minKey("customer", "c_custkey")
    val hotPart = minKey("part", "p_partkey")
    val hotOrder = minKey("orders", "o_orderkey")

    spark.read.parquet(s"$src/orders.parquet")
      .withColumn("o_custkey",
        when(pick(100 / HotCustomerOrderPct, col("o_orderkey")) === 0,
          lit(hotCust)).otherwise(col("o_custkey")))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // mega-basket reassignment keeps (l_orderkey, l_linenumber) UNIQUE:
    // rows pulled into the hot order are renumbered maxLn+1, maxLn+2, ...
    // (their original line numbers came from DIFFERENT orders and would
    // collide with each other and with the hot order's own lines — any
    // consumer keying on the composite would silently double-count). The
    // base is the TABLE's max line number, not a constant: a corpus with
    // wide orders (or a chained writeSkewed output, whose hot order
    // already carries renumbered rows) would collide with any fixed
    // base. The window partitions by the NEW orderkey, so every
    // partition is small except the one mega-basket; ordering by the
    // original composite keeps the numbering deterministic.
    val liSrc = spark.read.parquet(s"$src/lineitem.parquet")
    val maxLn = liSrc.agg(max(col("l_linenumber")).cast("long")).head().getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
      .orderBy(col("_ok0"), col("_ln0"))
    liSrc
      .withColumn("l_partkey",
        when(pick(100 / HotPartLinePct, col("l_orderkey"), col("l_linenumber")) === 0,
          lit(hotPart)).otherwise(col("l_partkey")))
      .withColumn("_mb",
        pick(1000 / MegaBasketPerMille,
          col("l_orderkey"), col("l_linenumber"), lit("mb")) === 0)
      .withColumn("_ok0", col("l_orderkey"))
      .withColumn("_ln0", col("l_linenumber"))
      .withColumn("l_orderkey",
        when(col("_mb"), lit(hotOrder)).otherwise(col("l_orderkey")))
      .withColumn("l_linenumber",
        when(col("_mb"), (lit(maxLn) + row_number().over(w)).cast("int"))
          .otherwise(col("l_linenumber")))
      .drop("_mb", "_ok0", "_ln0")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // size the boilerplate off the corpus's own longest document: the
    // length-preservation invariant (prefix substring must COVER plen)
    // holds for any regenerated testdata, not just today's ~600-char docs
    val docsSrc = spark.read.parquet(s"$src/documents.parquet")
    val maxLen = docsSrc.agg(max(length(col("text"))).cast("long")).head().getLong(0)
    val needed = math.ceil(maxLen * BoilerFrac).toInt + 1
    val boilerTexts = (0 to BoilerVariants).map(v => boilerText(v, needed))
    require(boilerTexts.forall(_.length >= needed),
      s"boilerplate shorter than BoilerFrac x longest doc ($needed chars) " +
        "— prefix replacement would silently shorten texts")
    val boilers = array(boilerTexts.map(lit): _*)
    val tier = pick(100, col("doc_id"), lit("boiler"))
    // variant 0 = the shared tier-A boilerplate; 1..BoilerVariants = tier B
    val variant = when(tier < BoilerTierAPct, lit(0))
      .when(tier < BoilerTierAPct + BoilerTierBPct,
        (pmod(xxhash64(col("doc_id"), lit("v")), lit(BoilerVariants.toLong)) + 1)
          .cast("int"))
      .otherwise(lit(-1))
    val plen = ceil(length(col("text")) * lit(BoilerFrac)).cast("int")
    docsSrc
      .withColumn("_v", variant)
      .withColumn("text",
        when(col("_v") >= 0,
          concat(
            element_at(boilers, col("_v") + 1).substr(lit(1), plen),
            col("text").substr(plen + 1, length(col("text")))))
          .otherwise(col("text")))
      .drop("_v")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: the hot-IVF-cell regime — re-aim [[HotCellVecPct]]% of
    // NON-CENTROID vectors at one centroid's direction with norms
    // preserved. Same count, same vec_ids, same norms ⇒ the sqrtSample
    // admission set (hash(vec_id) pmod n_vecs < k_cent) is IDENTICAL to
    // the uniform twin's, and centroid vectors are untouched (a re-aimed
    // centroid would collapse near-parallel to the hot one and split the
    // hot mass across FP-tie cells) — so exactly ONE cell absorbs the
    // selected third of the corpus, the regime where per-cell probe cost
    // stops being N/k_cent.
    // centroid admission comes from THE shared definition
    // (Embeddings.sqrtSample — the same one e4/e14/d8 run), never an
    // inline re-derivation that could silently drift if the sampling
    // rule changes; the admitted set is metadata-sized (<= MaxCentroids)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val centIds = graft.queries.Embeddings.sqrtSample(emb, emb)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0))
    // the hash-threshold admission count is binomial around k_cent —
    // bound it loosely, it only needs to stay metadata-sized
    require(centIds.nonEmpty &&
      centIds.length <= 4 * graft.queries.Embeddings.MaxCentroids,
      s"centroid sample out of range: ${centIds.length}")
    val isCentroid = col("vec_id").isin(centIds.toIndexedSeq: _*)
    val hotCid = centIds.min
    val hotVec = emb.filter(col("vec_id") === hotCid)
      .select(col("embedding")).head().getSeq[Float](0)
    val cLit = array(hotVec.map(f => lit(f.toDouble)): _*)
    def dotd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VecDot.dotCol(a, b)
    val lam = HotCellBlend
    val vN = sqrt(dotd(col("embedding"), col("embedding")))
    val cN = sqrt(dotd(cLit, cLit))
    val blended = zip_with(col("embedding").cast("array<double>"), cLit,
      (a, b) => a / vN * (1 - lam) + b / cN * lam)
    val bN = sqrt(dotd(blended, blended))
    emb
      .withColumn("embedding",
        when(pick(100 / HotCellVecPct, col("vec_id"), lit("hc")) === 0
            && !isCentroid,
          transform(blended, x => x * vN / bN).cast("array<float>"))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("customer", "part", "supplier", "nation", "region")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    // events: [[HotUserEventPct]]% of ALL events reassigned to the
    // smallest user id — the STREAMING-state skew regime (st9's
    // flatMapGroupsWithState gets one key carrying 2% of the corpus in
    // a single group iterator; w1/w2/w3's per-user windows get the same
    // hot partition). Same physical-type care as writeRelational.
    val ev = graft.core.Tables.events(spark, src)
    val hotUser = ev.agg(min(col("user_id")).cast("long")).head().getLong(0)
    ev.withColumn("user_id",
        when(pick(100 / HotUserEventPct, col("event_id"), lit("hu")) === 0,
          lit(hotUser)).otherwise(col("user_id")))
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"""{"skew_corpus":"$out","hot_cust":$hotCust,"hot_part":$hotPart,"hot_order":$hotOrder,"hot_user":$hotUser}""")
  }
}

/** `graft.SkewGen <uniformCorpusDir> <outDir>` — CLI for
  * [[ScaleGen.writeSkewed]]. */
object SkewGen {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    ScaleGen.writeSkewed(spark, args(0), args(1))
    spark.stop()
  }
}
