package graft

import org.apache.spark.sql.functions._

/** Invariants of the scaling-measurement corpus generator. These are
  * load-bearing for SCALE.md's measured exponents: if replica documents
  * stop matching replica vectors the filtered-ANN scaling read silently
  * degenerates to a constant base slice, and if replica ids ever join the
  * query id space the "query volume is a workload knob" premise breaks.
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  test("factor-3 corpus: replica docs align with replica vectors, queries stay base-only") {
    val src = java.nio.file.Files.createTempDirectory("graft_sg_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sg_out_").toString
    Seq((0L, "alpha beta", "en", "s", 400L), (1L, "gamma", "fr", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    // 64-dim: ScaleGen's orthogonal dimension-roll is built for the
    // driver corpus's fixed EmbDim
    Seq((0L, Seq.tabulate(64)(i => if (i == 0) 1f else 0f), 0),
      (1L, Seq.tabulate(64)(i => if (i == 1) 1f else 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    // minimal relational tables so writeRelational has inputs
    Seq((1L, "S")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$src/customer.parquet")
    Seq((1L, 1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "F", 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    Seq((1L, 1L, 1L, 1.0)).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    Seq((1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$src/events.parquet")
    Seq((1L, "p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$src/part.parquet")
    Seq((1L, "sp", 1L)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$src/supplier.parquet")
    Seq((1L, "n", 1L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$src/nation.parquet")
    Seq((1L, "r")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$src/region.parquet")

    ScaleGen.generate(spark, src, out, factor = 3)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")
    assert(docs.count() == 6 && vecs.count() == 6)

    // every replica document joins its replica vector 1:1 — the e12
    // measurement invariant (and the base rows keep their raw ids)
    val joined = docs.join(vecs, col("doc_id") === col("vec_id"))
    assert(joined.count() == 6, s"doc/vec alignment broken: ${joined.count()}")

    // replica vec_ids are ≡ 1 (mod 10) and labels ≥ 1000 — never a
    // query under the e1 (label = 0) or e2/e4/e5 (id % 10 = 0) rules
    val replicas = vecs.filter(col("vec_id") >= 1000000000000L)
    assert(replicas.count() == 4)
    assert(replicas.filter(pmod(col("vec_id"), lit(10L)) =!= 1L).count() == 0,
      "replica vec_ids must be ≡ 1 (mod 10)")
    assert(replicas.filter(col("label") < 1000).count() == 0,
      "replica labels must be ≥ 1000")

    // the cipher preserves language/source/length metadata and changes
    // the text 1:1 (same token count, disjoint tokens vs base)
    val baseText = docs.filter(col("doc_id") === 0L).select("text").as[String].head()
    val repTexts = docs.filter(col("doc_id") > 1000000000000L && col("lang") === "en")
      .select("text").as[String].collect()
    assert(repTexts.length == 2 && repTexts.forall(_ != baseText))
    assert(repTexts.forall(_.split(" ").length == baseText.split(" ").length),
      "cipher must be 1:1 on tokens")
  }

  test("writeSkewed: identical volume, preserved lengths, keys redistributed not invented") {
    // The skew measurement's load-bearing invariant: uniform and skewed
    // corpora differ ONLY in distribution — same row count per table,
    // same per-document text length (prefix REPLACEMENT) — so a
    // uniform/skewed wall-time ratio can't be measuring data size.
    val src = java.nio.file.Files.createTempDirectory("graft_skw_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_skw_out_").toString
    // one deliberately LONG doc (3000+ chars): the boilerplate must tile
    // to cover BoilerFrac x the longest doc or prefix replacement would
    // silently shorten it (the round-9 review finding)
    val docs = (0L until 400L).map(i =>
      (i, s"organic w$i " * 20 + s"tail$i", "en", "s", 1L)) :+
      ((400L, "long w " * 500 + "end", "en", "s", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    (1L to 50L).map(i => (i, "S")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$src/customer.parquet")
    (1L to 500L).map(i => (i, 1 + i % 50,
        java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "F", 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    (1L to 500L).flatMap(o => (1 to 3).map(ln =>
        (o, 1 + (o * 7 + ln) % 40, ln, 1.0)))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    Seq((1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$src/events.parquet")
    (1L to 40L).map(i => (i, "p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$src/part.parquet")
    Seq((1L, "sp", 1L)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$src/supplier.parquet")
    Seq((1L, "n", 1L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$src/nation.parquet")
    Seq((1L, "r")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$src/region.parquet")
    // enough vectors in varied directions that the hot-cell re-aim has a
    // centroid sample and a measurable assignment distribution
    (1L to 120L).map(i =>
        (i, Seq.tabulate(64)(j => math.sin(i * 13.7 + j * 0.91).toFloat),
          (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")

    ScaleGen.writeSkewed(spark, src, out)

    // volume identity, table by table
    for (t <- Seq("orders", "lineitem", "documents", "customer", "part",
        "events", "embeddings"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ==
        spark.read.parquet(s"$src/$t.parquet").count(), s"$t row count changed")

    // documents: every text keeps its EXACT length; some texts changed
    val lens = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("a"))
      .join(spark.read.parquet(s"$out/documents.parquet")
        .select(col("doc_id"), length(col("text")).as("b"),
          col("text").startsWith("zb").as("boiled")), "doc_id")
    assert(lens.filter(col("a") =!= col("b")).count() == 0,
      "prefix replacement must preserve every text length")
    val boiled = lens.filter(col("boiled")).count()
    assert(boiled > 0 && boiled < 401, s"boilerplate tier size off: $boiled")

    // keys are REASSIGNED to existing mins, never invented: the skewed
    // key sets are subsets of the uniform ones, and the min key is hot
    val sk = spark.read.parquet(s"$out/lineitem.parquet")
    assert(sk.join(spark.read.parquet(s"$src/part.parquet"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0,
      "skewed l_partkey must stay inside the part dim")
    val hotShare = sk.filter(col("l_partkey") === 1L).count().toDouble / 1500
    assert(hotShare > 0.02 && hotShare < 0.10,
      s"hot part share out of band: $hotShare")

    // embeddings: vec_ids and NORMS are preserved (so the centroid
    // admission set and all normalization math match the uniform twin),
    // a nontrivial share of vectors changed direction, and the IVF
    // assignment now has a HOT CELL absorbing far more than N/k
    val eu = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("a"))
    val es = spark.read.parquet(s"$out/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("b"))
    assert(es.count() == 120 &&
      es.join(eu, "vec_id").count() == 120, "vec_id set must be preserved")
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(graft.functions.VecDot.dotCol(c, c))
    val joined = eu.join(es, "vec_id")
      .select(col("vec_id"), nrm(col("a")).as("na"), nrm(col("b")).as("nb"),
        (col("a") =!= col("b")).as("moved"))
      .collect()
    assert(joined.forall(r =>
      math.abs(r.getDouble(1) - r.getDouble(2)) <= 1e-4 * r.getDouble(1)),
      "re-aimed vectors must keep their norms")
    val movedN = joined.count(_.getBoolean(3))
    assert(movedN > 20 && movedN < 60, s"hot-cell share off: $movedN/120 moved")
    val vnS = graft.ops.IvfIndex.normalized(
      spark.read.parquet(s"$out/embeddings.parquet"))
    val cellTop = graft.ops.IvfIndex
      .assignCells(vnS, graft.ops.IvfIndex.centroidsOf(vnS))
      .groupBy(col("cid")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(cellTop >= movedN,
      s"one cell must absorb the re-aimed mass: top=$cellTop moved=$movedN")

    // mega-basket rows are renumbered, so the composite line key stays
    // unique — a consumer joining on (l_orderkey, l_linenumber) must
    // never double-count on the skewed corpus
    assert(sk.groupBy(col("l_orderkey"), col("l_linenumber")).count()
      .filter(col("count") > 1).count() == 0,
      "(l_orderkey, l_linenumber) must stay unique after reassignment")
    assert(sk.filter(col("l_orderkey") === 1L).count() >
      spark.read.parquet(s"$src/lineitem.parquet")
        .filter(col("l_orderkey") === 1L).count(),
      "mega-basket reassignment must actually engage in this fixture")
  }
}
