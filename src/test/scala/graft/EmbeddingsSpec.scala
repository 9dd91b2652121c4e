package graft

import org.apache.spark.sql.functions._

/** Tests for the similarity-search operators. e1/e2/e4 are all DuckDB
  * oracle-checked (e2's hyperplanes are precomputed literals); these specs
  * add the quantitative bars the oracle can't express — recall vs exact —
  * plus plan-shape and cosine-math sanity.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("cosine math matches hand computation") {
    val df = Seq((1L, Array(1.0f, 0.0f, 2.0f)), (2L, Array(2.0f, 0.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val cos = df.filter($"vec_id" === 1L)
      .crossJoin(df.filter($"vec_id" === 2L).select($"embedding".as("b")))
      .select((dot($"embedding", $"b") /
        (sqrt(dot($"embedding", $"embedding")) * sqrt(dot($"b", $"b")))).as("cos"))
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12, s"parallel vectors cosine $cos != 1")
  }

  test("e1 on testdata: every query returns 5 ranked neighbors, scores in [-1,1]") {
    val res = SparkEntry.queries("e1_cosine_topk")(spark, "/root/testdata/sf0.001")
    val rows = res.collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} neighbors")
      assert(rs.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
      val ranks = rs.map(_.getLong(3)).sorted
      assert(ranks.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    }
  }

  test("e10 SQ rescore: angle fixture ranks by true angle through the int8 shortlist") {
    // 63 candidates on the unit circle at i degrees (ids 1..69 skipping
    // multiples of 10) + one query (id 70) at 0 degrees: more candidates
    // than the 50-wide shortlist, so the int8 ADC cut is actually
    // exercised, while the exact re-rank must order the survivors by
    // true angle — top-5 is ids 1..5 with scores within float32+floor
    // noise of cos(i degrees).
    val dir = java.nio.file.Files.createTempDirectory("graft_e10_").toString
    val vecs = ((1L to 69L).filterNot(_ % 10 == 0).map { i =>
      val th = math.toRadians(i.toDouble)
      (i, Array(math.cos(th).toFloat, math.sin(th).toFloat, 0.0f, 0.0f), 1)
    } :+ ((70L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1)))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("e10_sq_rescore")(spark, dir)
      .filter($"q_id" === 70L).orderBy($"rn").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      s"top-5 must be the 5 smallest angles: ${rows.mkString(", ")}")
    rows.zipWithIndex.foreach { case (r, i) =>
      val want = math.cos(math.toRadians((i + 1).toDouble))
      assert(math.abs(r.getDouble(2) - want) < 2e-5,
        s"rank ${i + 1}: score ${r.getDouble(2)} != cos(${i + 1} deg) $want")
    }
  }

  test("e10 on testdata: every query returns 5 ranked neighbors, scores in [-1,1]") {
    val rows = SparkEntry.queries("e10_sq_rescore")(spark, "/root/testdata/sf0.001")
      .collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} neighbors")
      assert(rs.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
      assert(rs.map(_.getLong(3)).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    }
  }

  test("e2 ANN buckets: identical vectors share a bucket and self-similar top hit") {
    val res = SparkEntry.queries("e2_ann_lsh_buckets")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(res.nonEmpty, "LSH buckets produced no candidate neighbors")
    // scores are valid cosines
    assert(res.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("e1 plan: top-k aggregates map-side (partial mode) before the shuffle") {
    // the scale property that made e1 134s→1.5s: the BoundedTopK buffer
    // must run in Partial mode below the exchange so only |Q|·partitions·k
    // candidate rows shuffle — guard it against plan regressions
    val plan = SparkEntry.queries("e1_cosine_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial_boundedtopk") || plan.contains("partial_topk")
      || (plan.contains("objecthashaggregate") && plan.contains("partial")),
      s"e1 plan lost its map-side partial top-k aggregation:\n$plan")
  }

  test("e4 IVF recall gate: >= 0.8 against exact top-k on shared queries at sf0.01") {
    val sf = "/root/testdata/sf0.01"
    val e1 = SparkEntry.queries("e1_cosine_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val e4 = SparkEntry.queries("e4_ann_ivf")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val shared = e1.keySet.intersect(e4.keySet)
    assert(shared.nonEmpty)
    val recall = shared.toSeq.map { q =>
      e1(q).intersect(e4(q)).size.toDouble / e1(q).size
    }.sum / shared.size
    info(f"IVF recall@5 vs exact top-k: $recall%.3f over ${shared.size} shared queries")
    // 8-probe measured recall@5 = 0.889 with the ~sqrt(N) centroid sample
    // (5 probes measured 0.733 — nprobe is the recall/cost knob);
    // deterministic
    assert(recall >= 0.8, f"IVF recall@5 $recall%.3f below the 0.8 gate")
  }

  test("e5 PQ recall gate: >= 0.8 against exact top-k on shared queries at sf0.01") {
    // PQ + ADC shortlist-50 + exact re-rank; measured recall@5 = 0.889 on the e1-shared queries
    // (ADC-only would be 0.436 — the re-rank stage is what makes PQ a
    // serving-grade index). Deterministic end to end.
    val sf = "/root/testdata/sf0.01"
    val e1 = SparkEntry.queries("e1_cosine_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val e5 = SparkEntry.queries("e5_pq_adc_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val shared = e1.keySet.intersect(e5.keySet)
    assert(shared.nonEmpty)
    val recall = shared.toSeq.map { q =>
      e1(q).intersect(e5(q)).size.toDouble / e1(q).size
    }.sum / shared.size
    info(f"PQ recall@5 vs exact top-k: $recall%.3f over ${shared.size} shared queries")
    assert(recall >= 0.8, f"PQ recall@5 $recall%.3f below the 0.8 gate")
  }

  test("e2 recall gate: >= 0.7 against e1 exact top-k at sf0.01") {
    // The oracle proves e2 computes ITS OWN definition correctly; this
    // gate measures whether that definition is a GOOD approximation —
    // recall@5 against the exact top-k on the queries both answer.
    val sf = "/root/testdata/sf0.01"
    // the literal hyperplanes bake in EmbDim — catch a dim change loudly
    val dim = graft.core.Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(dim == Seq(graft.queries.Embeddings.EmbDim),
      s"embedding dim $dim != baked-in ${graft.queries.Embeddings.EmbDim}")
    // the corpus contract the normalize pipelines rely on: a zero-norm
    // vector would abort the normalize there (Spark 4 ANSI raises
    // DIVIDE_BY_ZERO for double 0/0 — pinned below) — catch it here with
    // the actual cause first; e8/CorpusContract is the production gate
    val zeroNorm = graft.core.Tables.embeddings(spark, sf)
      .filter(expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) = 0.0"))
      .count()
    assert(zeroNorm == 0L, s"$zeroNorm zero-norm embedding vectors in testdata")
    val e1 = SparkEntry.queries("e1_cosine_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val e2 = SparkEntry.queries("e2_ann_lsh_buckets")(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val shared = e1.keySet.intersect(e2.keySet)
    assert(shared.nonEmpty, "e1 (label=0) and e2 (vec_id%10=0) share no queries")
    val recall = shared.toSeq.map { q =>
      e1(q).intersect(e2(q)).size.toDouble / e1(q).size
    }.sum / shared.size
    info(f"ANN recall@5 vs exact top-k: $recall%.3f over ${shared.size} shared queries")
    // radius-4 multi-probe over 8 bits measured recall@5 = 0.889 at this
    // SF — a drop below this gate means the hyperplane bucketing broke,
    // not noise (everything in the pipeline is deterministic).
    assert(recall >= 0.7, f"ANN recall@5 $recall%.3f below the 0.7 gate")
  }

  test("e8 pre-flight contract: clean corpus validates, poisoned corpus is caught before any ranking") {
    import graft.ops.CorpusContract
    // clean shipped testdata passes the gate
    val clean = SparkEntry.queries("e8_corpus_contract")(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(clean.getBoolean(6), s"shipped testdata failed the corpus contract: $clean")
    assert(clean.getLong(0) > 0)
    CorpusContract.assertValid(
      graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001"), "embedding", 64)
    // poisoned corpus: one violation per class, plus one good row
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_").toString
    val good = Array.tabulate(64)(i => (i + 1).toFloat)
    Seq(
      (1L, Array.fill(64)(0f), 0),                       // zero norm
      (2L, Array(1f, 2f), 0),                            // wrong dim
      (3L, good.updated(7, Float.NaN), 0),               // NaN component
      (4L, good.updated(3, Float.PositiveInfinity), 0),  // Inf component
      (5L, good, 0)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("e8_corpus_contract")(spark, dir).collect()(0)
    assert(r.getLong(0) == 5L, s"n_vecs: $r")
    assert(r.getLong(3) == 1L, s"n_bad_dim: $r")
    assert(r.getLong(4) == 2L, s"n_nonfinite (NaN + Inf): $r")
    assert(r.getLong(5) == 1L, s"n_zero_norm: $r")
    assert(!r.getBoolean(6), "poisoned corpus must fail validation")
    val ex = intercept[IllegalStateException] {
      CorpusContract.assertValid(
        graft.core.Tables.embeddings(spark, dir), "embedding", 64)
    }
    assert(ex.getMessage.contains("zero-norm") && ex.getMessage.contains("wrong-dim"),
      s"error must name the violation classes: ${ex.getMessage}")
  }

  test("NaN posture: ANSI double 0/0 aborts; x/NaN and floor(NaN) are SILENT — why !isnan filters exist") {
    // pins the three ANSI/IEEE facts the Embeddings comments and guards
    // rely on, so a Spark upgrade that changes any of them surfaces here
    // first. (1) double division by zero DOES raise under Spark 4 ANSI —
    // a zero-norm vector aborts the normalize loudly:
    val divThrown = intercept[Exception] {
      Seq((Array(1.0f, 2.0f), 0.0)).toDF("v", "nrm")
        .select(transform($"v", x => x.cast("double") / $"nrm").as("ne")).collect()
    }
    assert(divThrown.getMessage.contains("DIVIDE_BY_ZERO"),
      s"double 0/0 must raise ANSI DIVIDE_BY_ZERO: ${divThrown.getMessage.take(120)}")
    // (2) division BY NaN propagates silently (no error) — a NaN/Inf
    // embedding component reaches the rankings as a NaN cosine, and NaN
    // tops Double.compare; this is the path the !isnan filters close:
    val nanQ = Seq((1.0, Double.NaN)).toDF("a", "b")
      .select(($"a" / $"b").as("q")).collect()(0).getDouble(0)
    assert(nanQ.isNaN, "x/NaN must propagate NaN silently")
    // (3) floor(NaN) is silently 0L, not an error — e3's NaN pairs drop
    // at the >= 0.3 threshold instead of aborting or emitting:
    val f = Seq(Double.NaN).toDF("x")
      .select(floor($"x" * 1000000).as("f")).collect()(0).getLong(0)
    assert(f == 0L, s"floor(NaN) expected silent 0, got $f")
  }

  test("sqrtSample caps the centroid/codebook sample at MaxCentroids past ~65k vectors") {
    // below the cap: ~sqrt(N) admitted (recall-honest small-corpus rule);
    // above it: bounded at MaxCentroids=256, making d8/e4 assignment and
    // e5 encode strictly linear in the corpus (the SCALE.md story)
    // 1M ids: uncapped ceil(sqrt) would admit ~1000 — the <= 400 bound
    // FAILS if the cap is ever removed (a 70k corpus could not tell:
    // uncapped 265 vs capped 256 both sit in any reasonable band)
    val big = spark.range(1000000).select(col("id").as("vec_id"))
    val capped = graft.queries.Embeddings.sqrtSample(big, big).count()
    assert(capped >= 150 && capped <= 400,
      s"1M-corpus sample must sit near the 256 cap, not ceil(sqrt)=1000: $capped")
    val small = spark.range(100).select(col("id").as("vec_id"))
    val s = graft.queries.Embeddings.sqrtSample(small, small).count()
    assert(s >= 3 && s <= 25, s"100-corpus sample must track sqrt(100): $s")
  }

  test("e6 k-means step: planted geometry assigns and averages exactly") {
    // seeds are the 8 lowest vec_ids: seed i sits at x = 10i; member 8+i
    // sits at x = 10i + 1, unambiguously nearest seed i. Every cluster
    // then holds exactly {seed, member} and the dim-0 mean is 10i + 0.5
    // (exact: integer micros, one final division).
    val dir = java.nio.file.Files.createTempDirectory("graft_km_").toString
    val rows = (0 until 8).map { i =>
      (i.toLong, Array(10f * i, 0f, 0f, 0f), 0)
    } ++ (0 until 8).map { i =>
      (8L + i, Array(10f * i + 1f, 0f, 0f, 0f), 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("e6_kmeans_step")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    assert(got.size == 8 * 4, s"expected 8 clusters x 4 dims, got ${got.size}")
    (0 until 8).foreach { i =>
      assert(got((i.toLong, 0L)) == ((2L, 10.0 * i + 0.5)),
        s"cluster $i dim 0: ${got((i.toLong, 0L))}")
      (1 to 3).foreach { d =>
        assert(got((i.toLong, d.toLong)) == ((2L, 0.0)),
          s"cluster $i dim $d must average to exactly 0")
      }
    }
    // e7 on the same geometry: each cluster contributes exactly its two
    // members, seed first (lowest vec_id)
    val sample = SparkEntry.queries("e7_cluster_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(sample.size == 16, s"2 members x 8 clusters: ${sample.size}")
    (0 until 8).foreach { i =>
      assert(sample((i.toLong, 1L)) == i.toLong, s"cluster $i rank 1 = seed")
      assert(sample((i.toLong, 2L)) == 8L + i, s"cluster $i rank 2 = twin")
    }
  }

  test("e11 matryoshka recall gate: mean recall@10 >= 0.55 and beats the random-shortlist baseline at sf0.01") {
    // The oracle hash-proves e11 computes ITS OWN per-query recall
    // correctly; this gate measures whether prefix-32 truncation is a
    // USEFUL shortlist on this corpus. Measured mean recall@10 = 0.70 at
    // sf0.01 (prefix-16 sweeps to 0.435 — dims carry iid information
    // here, the worst case for truncation). A RANDOM 50-of-499 shortlist
    // would recall 50/499 ≈ 0.10 in expectation; the gate sits far above
    // that and comfortably below the measured value. Deterministic.
    val rows = SparkEntry.queries("e11_matryoshka_recall")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    info(f"matryoshka prefix-32 mean recall@10: $mean%.3f over ${rows.length} queries")
    assert(mean >= 0.55, f"mean recall@10 $mean%.3f below the 0.55 gate")
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1) / 10.0,
        s"recall must equal n_hit/10 for query ${r.getLong(0)}")
    }
  }
}
