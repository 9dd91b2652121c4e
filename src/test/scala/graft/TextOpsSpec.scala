package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the corpus-hygiene ops: t8 benchmark
  * decontamination and t9 boilerplate detection. The fixtures write a
  * crafted documents.parquet so the queries run through the exact same
  * table-loading path the driver uses.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Write docs as a documents.parquet in a fresh dir; returns the dir. */
  private def docsDir(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_txt_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t32 hashed DSIR equals exact t18 on a collision-free vocabulary") {
    // the hashing-trick contract: when no two vocabulary tokens share a
    // bucket, pooling is a bijection and the hashed variant must
    // reproduce the exact per-token computation bit for bit — same
    // counts, same smoothing, same micro-weights, same ranking
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
      "november", "oscar", "papa")
    val buckets = vocab.map(t =>
      graft.functions.TextFunctions.portableHash60("dsir:" + t) %
        graft.queries.TextOps.DsirBuckets)
    assert(buckets.distinct.size == vocab.size,
      "spec vocabulary must be collision-free in the hashed feature space")
    val dir = Files.createTempDirectory("graft_dsir_").toString
    (1L to 40L).map { i =>
        val words = (0 until 30).map(j => vocab(((i * 31 + j * 17) % vocab.size).toInt))
        val src = if (i % 4 == 0) "a_target" else "web"
        (i, words.mkString(" "), src)
      }.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rows(name: String): Seq[(Long, Long, Long)] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = rows("t18_dsir_importance")
    val hashed = rows("t32_dsir_hashed")
    assert(exact.nonEmpty, "parity fixture must produce scored documents")
    assert(hashed == exact,
      "hashed DSIR must equal exact DSIR on a collision-free vocabulary")
  }

  test("t8: a corpus doc quoting a benchmark 5-gram is flagged; clean docs are not") {
    // doc 0 (id%50==0) is the benchmark; doc 1 quotes 5 consecutive
    // tokens of it; doc 2 shares only shorter fragments
    val dir = docsDir(Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta",
      1L -> "noise one two alpha beta gamma delta epsilon more noise",
      2L -> "alpha beta something gamma delta epsilon"))
    val got = SparkEntry.queries("t8_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == Set(1L, 2L), "benchmark docs must not appear in the report")
    assert(got(1L) == ((1L, 1L, true)),
      s"doc 1 shares exactly 'alpha beta gamma delta epsilon': ${got(1L)}")
    assert(got(2L) == ((0L, 0L, false)), s"doc 2 has no shared 5-gram: ${got(2L)}")
  }

  test("t9: a 3-gram planted in >=5 docs is boilerplate; unique text scores 0") {
    val common = "lorem ipsum dolor"
    val docs = (1L to 5L).map(i => i -> s"unique$i padding$i $common tail$i") :+
      (6L -> "entirely fresh words nothing repeated here")
    val dir = docsDir(docs)
    val got = SparkEntry.queries("t9_boilerplate_ngrams")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    (1L to 5L).foreach { i =>
      assert(got(i)._1 == 1L, s"doc $i must report exactly the planted boilerplate 3-gram")
      assert(got(i)._2 > 0.0 && got(i)._2 < 1.0)
    }
    assert(got(6L) == ((0L, 0.0)), "fresh doc must score zero boilerplate")
  }

  test("t8/t9 are total over the corpus at sf0.001 (clean docs report too)") {
    val sf = "/root/testdata/sf0.001"
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    val nBench = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % 50 === 0).count()
    assert(SparkEntry.queries("t8_decontaminate")(spark, sf).count() == nDocs - nBench)
    val t9 = SparkEntry.queries("t9_boilerplate_ngrams")(spark, sf)
    assert(t9.count() == nDocs)
    assert(t9.filter(col("boilerplate_ratio") < 0 || col("boilerplate_ratio") > 1).count() == 0)
  }

  test("t21/t22: bucket totals partition the corpus; shuffle is a true permutation") {
    val sf = "/root/testdata/sf0.001"
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    // t21: every doc lands in exactly one bucket; padded >= total always
    val t21 = SparkEntry.queries("t21_length_buckets")(spark, sf)
    assert(t21.agg(sum(col("n_docs"))).head().getLong(0) == nDocs)
    assert(t21.filter(col("padded_tokens") < col("total_tokens")).count() == 0)
    assert(t21.filter(col("waste_ppm") < 0 || col("waste_ppm") > 1000000).count() == 0)
    // t22: all docs appear once, and within each shard positions are
    // exactly 1..count — i.e. (shard, pos) is a reproducible permutation
    val t22 = SparkEntry.queries("t22_shuffle_shards")(spark, sf)
    assert(t22.count() == nDocs)
    assert(t22.select("doc_id").distinct().count() == nDocs)
    val bad = t22.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L || col("nd") =!= col("n"))
    assert(bad.count() == 0, "each shard's positions must be exactly 1..count")
    // determinism: a second run yields the identical permutation
    val again = SparkEntry.queries("t22_shuffle_shards")(spark, sf)
    assert(t22.exceptAll(again).count() == 0 && again.exceptAll(t22).count() == 0)
  }

  test("t23: OOV rates against the en-fit vocab on planted multilingual docs") {
    val dir = Files.createTempDirectory("graft_oov_").toString
    Seq(
      (1L, "alpha beta gamma alpha", "en"),
      (2L, "alpha novel1 novel2 beta", "zh"),
      (3L, "novel3 novel3 novel3", "fr"))
      .toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t23_vocab_coverage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // en fits the vocab, so its coverage is total; zh shares half its
    // tokens with it; fr shares none
    assert(rows("en") == ((4L, 0L, 0L)), s"en: $rows")
    assert(rows("zh") == ((4L, 2L, 500000L)), s"zh: $rows")
    assert(rows("fr") == ((3L, 3L, 1000000L)), s"fr: $rows")
  }

  test("t21 upper buckets: 128 and 256 boundaries on planted long docs") {
    // testdata maxes out near 100 tokens, so buckets 4 (<256) and 5
    // (>=256) are otherwise dead code for both the oracle and the
    // partition test above — plant docs that exercise them, including a
    // non-trivial padding-waste value
    val dir = docsDir(Seq(
      (1L, Seq.fill(150)("a").mkString(" ")), // bucket 4
      (2L, Seq.fill(200)("b").mkString(" ")), // bucket 4
      (3L, Seq.fill(300)("c").mkString(" ")), // bucket 5
      (4L, Seq.fill(10)("d").mkString(" ")))) // bucket 0
    val rows = SparkEntry.queries("t21_length_buckets")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bucket 4: 2 docs, 350 tokens, padded to 2×200 → waste 50/400 = 125000 ppm
    assert(rows(4L) == ((2L, 350L, 200L, 400L, 125000L)), s"bucket 4: ${rows.get(4L)}")
    // singleton bucket pads nothing
    assert(rows(5L) == ((1L, 300L, 300L, 300L, 0L)), s"bucket 5: ${rows.get(5L)}")
    assert(rows(0L)._1 == 1L)
    assert(rows.keySet == Set(0L, 4L, 5L), s"empty buckets must not emit rows: $rows")
  }

  test("t15: unigram LM scores common-token docs below rare-token docs, micro-nat exact") {
    // corpus: 8 docs of the common token, 1 doc of four singletons.
    // The rare doc's avg negative log-likelihood must be strictly higher,
    // and the common doc's value must equal the closed-form micro-nat
    // count (floor(-ln(k/T) * 1e6)) computed independently here.
    val dir = docsDir(
      (1L to 8L).map(i => i -> "common common common common") :+
        (9L -> "rareA rareB rareC rareD"))
    val got = SparkEntry.queries("t15_unigram_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val total = 8 * 4 + 4 // 36 tokens
    val commonNll = math.floor(-math.log(32.0 / total) * 1000000).toLong
    val rareNll = math.floor(-math.log(1.0 / total) * 1000000).toLong
    (1L to 8L).foreach { i =>
      assert(got(i) == ((4L, commonNll)), s"doc $i: ${got(i)} != $commonNll")
    }
    assert(got(9L) == ((4L, rareNll)), s"rare doc: ${got(9L)} != $rareNll")
    assert(rareNll > commonNll)
  }

  test("t24: bigram LM separates word salad that t15 scores as fluent") {
    // 8 fluent "a b c" docs and one salad "b a c" with the IDENTICAL
    // unigram bag — t15 (bag-of-words) must score them equal, t24 must
    // score the salad strictly higher, and both t24 values must equal
    // the closed-form micro-nats. A 1-token doc must yield no row.
    val dir = docsDir(
      (1L to 8L).map(i => i -> "a b c") ++ Seq(9L -> "b a c", 10L -> "solo"))
    val uni = SparkEntry.queries("t15_unigram_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(uni(1L) == uni(9L), s"t15 must not separate the salad: $uni")
    val got = SparkEntry.queries("t24_bigram_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // c("a b")=8, c("b c")=8, c("b a")=1, c("a c")=1; c1("a")=c1("b")=9
    val fluent = math.floor(-math.log(8.0 / 9.0) * 1000000).toLong
    val salad = math.floor(-math.log(1.0 / 9.0) * 1000000).toLong
    (1L to 8L).foreach { i =>
      assert(got(i) == ((2L, fluent)), s"doc $i: ${got(i)} != $fluent")
    }
    assert(got(9L) == ((2L, salad)), s"salad doc: ${got(9L)} != $salad")
    assert(salad > fluent)
    assert(!got.contains(10L), s"1-token doc must produce no row: $got")
  }

  test("t27: Kneser-Ney separates continuation diversity that t24's MLE ties") {
    // bigrams "a x" and "b y" have IDENTICAL c2/c1/N1+(w1·) — raw MLE
    // (t24) must score them equal — but y continues 3 distinct histories
    // while x continues 1, so KN's continuation term must rank "b y" as
    // MORE expected (strictly lower nll). All values pinned to the
    // closed form, operation for operation.
    val dir = docsDir(
      (1L to 4L).map(i => i -> "a x") ++ (5L to 8L).map(i => i -> "b y") ++
        Seq(9L -> "c y", 10L -> "d y"))
    val mle = SparkEntry.queries("t24_bigram_lm_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(mle(1L) == mle(5L), s"t24 must tie the two bigrams: $mle")
    // corpus model: B = 4 distinct bigrams; the exact double expression
    // the query computes, operation for operation
    def kn(c2: Long, c1: Long, n1f: Long, n1b: Long): Long = {
      val p = (math.max(c2.toDouble - 0.75, 0.0) +
        0.75 * n1f.toDouble * (n1b.toDouble / 4.0)) / c1.toDouble
      math.floor(-math.log(p) * 1000000.0).toLong
    }
    val got = SparkEntry.queries("t27_kneser_ney_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    (1L to 4L).foreach { i => assert(got(i) == ((1L, kn(4, 4, 1, 1))), s"doc $i: ${got(i)}") }
    (5L to 8L).foreach { i => assert(got(i) == ((1L, kn(4, 4, 1, 3))), s"doc $i: ${got(i)}") }
    assert(got(9L) == ((1L, kn(1, 1, 1, 3))), s"doc 9: ${got(9L)}")
    assert(got(10L) == ((1L, kn(1, 1, 1, 3))), s"doc 10: ${got(10L)}")
    assert(got(1L)._2 > got(5L)._2,
      s"KN must rank the diverse continuation as more expected: $got")
  }

  test("t16: BM25 micros match the closed form; non-matching docs excluded") {
    // query terms (df desc, token asc among len>=6): quantum(4),
    // gradient(3), synthesis(3); epsilon has df=1 and is never selected
    val dir = docsDir(Seq(
      1L -> "quantum synthesis gradient alpha",
      2L -> "quantum quantum synthesis gradient beta gamma",
      3L -> "quantum synthesis gradient",
      4L -> "alpha beta",
      5L -> "quantum epsilon"))
    val dls = Map(1L -> 4L, 2L -> 6L, 3L -> 3L, 4L -> 2L, 5L -> 2L)
    val dfs = Map("quantum" -> 4L, "gradient" -> 3L, "synthesis" -> 3L)
    val tfs = Map( // (doc, term) -> tf, for terms present only
      (1L, "quantum") -> 1L, (1L, "gradient") -> 1L, (1L, "synthesis") -> 1L,
      (2L, "quantum") -> 2L, (2L, "gradient") -> 1L, (2L, "synthesis") -> 1L,
      (3L, "quantum") -> 1L, (3L, "gradient") -> 1L, (3L, "synthesis") -> 1L,
      (5L, "quantum") -> 1L)
    val nd = 5.0
    val avgdl = dls.values.sum.toDouble / nd
    // the exact double expression the query computes, operation for operation
    def micro(doc: Long, term: String): Long = {
      val df = dfs(term).toDouble; val tf = tfs((doc, term)).toDouble
      val idf = math.log(1.0 + ((nd - df) + 0.5) / (df + 0.5))
      val part = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls(doc) / avgdl)))
      math.floor((idf * part) * 1000000.0).toLong
    }
    val expected = tfs.keys.toSeq.groupBy(_._1).map { case (doc, ks) =>
      doc -> ((ks.size.toLong, ks.map { case (d, t) => micro(d, t) }.sum))
    }
    val got = SparkEntry.queries("t16_bm25_retrieval")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L), s"doc 4 matches no term: ${got.keySet}")
    expected.foreach { case (doc, exp) =>
      assert(got(doc) == exp, s"doc $doc: got ${got(doc)}, closed form $exp")
    }
    // length normalization: same tfs, shorter doc outranks; and a
    // single-low-idf-term doc trails every all-terms doc
    assert(got(3L)._2 > got(1L)._2, "shorter dl must outrank at equal tf")
    assert(Seq(1L, 2L, 3L).forall(d => got(d)._2 > got(5L)._2),
      "one low-idf term cannot outrank three-term matches")
  }

  test("t17: sqrt-temperature quotas — small sources upweighted vs proportional") {
    // sources of 16/4/1 docs: wm = 4e6/2e6/1e6, W = 7e6, budget = 21*2/5 = 8
    // → quotas 32/7=4, 16/7=2, 8/7=1. A proportional split would give
    // 6/1/0 — the temperature boosts C from 0 to 1 and damps A from 6 to 4.
    val dir = java.nio.file.Files.createTempDirectory("graft_tmix_").toString
    val docs = (1 to 16).map(i => (i.toLong, s"adoc number$i words", "A")) ++
      (1 to 4).map(i => (100L + i, s"bdoc number$i words", "B")) :+
      ((200L, "cdoc only words", "C"))
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t17_temperature_mix")(spark, dir).collect()
    val perSource = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perSource == Map("A" -> 4, "B" -> 2, "C" -> 1),
      s"quota math: $perSource")
    // ranks within each source are 1..quota (the hash order is a
    // permutation, so the kept set is exactly the quota prefix)
    got.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getLong(2)).sorted.sameElements(1L to rows.length),
        s"$src ranks must be the 1..quota prefix")
    }
  }

  test("t17 rank-free admission lands within 4*sqrt(quota)+3 of each exact quota") {
    // sources sized 1200/300/75: big enough that the binomial jitter of
    // the hash-threshold admit is visibly smaller than the quotas
    val docs = (1 to 1200).map(i => (i.toLong, s"alpha doc $i unique words", "A")) ++
      (1 to 300).map(i => (2000L + i, s"beta doc $i unique words", "B")) ++
      (1 to 75).map(i => (3000L + i, s"gamma doc $i unique words", "C"))
    val doc = docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("source"), col("text"))
    val quotas = graft.queries.TextOps.temperatureQuotas(doc)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val admitted = graft.queries.TextOps.temperatureMixRankFree(doc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val perSource = admitted.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    quotas.foreach { case (src, q) =>
      val got = perSource.getOrElse(src, 0L)
      val bound = 4 * math.sqrt(q.toDouble) + 3
      info(f"$src: quota $q, admitted $got, deviation ${got - q} (bound ±$bound%.0f)")
      assert(math.abs(got - q) <= bound,
        s"$src admitted $got vs quota $q — outside ±$bound")
    }
    // deterministic: a second run admits the exact same set
    val again = graft.queries.TextOps.temperatureMixRankFree(doc)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(admitted.toSet == again.toSet, "admission must be deterministic")
  }

  test("t18: DSIR micros match the closed form; domain-like docs outrank") {
    // target = source 'a_tgt' (lexicographic min). domainword is target-
    // loaded, otherword exists only in candidates, common is everywhere.
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_").toString
    val docs = Seq(
      (1L, "domainword common", "a_tgt"), (2L, "domainword common", "a_tgt"),
      (10L, "domainword common", "b_cand"), (11L, "common common", "b_cand"),
      (12L, "otherword common", "b_cand"))
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (tt, tc, v) = (4L, 10L, 3L)
    val cc = Map("domainword" -> 3L, "common" -> 6L, "otherword" -> 1L)
    val ct = Map("domainword" -> 2L, "common" -> 2L, "otherword" -> 0L)
    def w(tok: String): Long =
      math.floor(math.log(((ct(tok) + 1) * (tc + v)).toDouble /
        ((cc(tok) + 1) * (tt + v)).toDouble) * 1000000.0).toLong
    val expected = Map(
      10L -> ((2L, w("domainword") + w("common"))),
      11L -> ((2L, w("common") + w("common"))),
      12L -> ((2L, w("otherword") + w("common"))))
    val got = SparkEntry.queries("t18_dsir_importance")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got, closed form $expected")
    // the domainword candidate must outrank common-only; the candidate-
    // only token drags below the corpus-neutral doc
    assert(got(10L)._2 > got(12L)._2 && got(12L)._2 > got(11L)._2,
      "importance order must be domain-like > neutral > anti-domain")
  }

  test("t19: twin docs score zero novelty, a unique doc scores 1e6") {
    // twins 1/2 share every winnow region (df = 2 for each fingerprint
    // -> novelty 0); doc 3 shares none (df = 1 throughout -> 1e6); doc 4
    // is one token short of a full window -> no fingerprints, no row
    val dir = java.nio.file.Files.createTempDirectory("graft_t19_").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"),
      (4L, "tiny doc here now end")) // 3 shingles < w=4 -> no window
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t19_novelty_profile")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1000000L),
      s"novelty profile: $got")
  }

  test("t20: RRF fuses lexical and semantic evidence; word-only and meaning-only docs both surface") {
    // planted geometry around query doc 0 (id % 100 == 0, has embedding):
    //   doc 1 — shares the words AND the embedding direction (true dup)
    //   doc 2 — shares the words only (embedding orthogonal)
    //   doc 3 — shares the meaning only (no common token, embedding close)
    //   doc 4 — unrelated on both axes
    val qText = "alpha beta gamma delta epsilon zeta"
    val dir = Files.createTempDirectory("graft_t20_").toString
    Seq(
      (0L, qText),
      (1L, qText + " eta theta"),
      (2L, "zeta epsilon delta gamma beta alpha extra words here"),
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def vec(main: Int, lean: Double): Array[Float] = {
      val a = Array.fill(64)(0f); a(main) = 1f
      if (lean != 0.0) { a(0) = lean.toFloat; a(main) = math.sqrt(1 - lean * lean).toFloat }
      a
    }
    Seq(
      (0L, vec(0, 0.0), 0),   // query: e0 axis
      (1L, vec(1, 0.99), 0),  // cos ~0.99 to query
      (2L, vec(2, 0.0), 0),   // orthogonal
      (3L, vec(3, 0.97), 0),  // cos ~0.97 to query
      (4L, vec(4, 0.0), 0))   // orthogonal
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("t20_hybrid_rrf")(spark, dir).collect()
    assert(rows.forall(_.getLong(0) == 0L), s"only doc 0 is a query: ${rows.toSeq}")
    val byDoc = rows.map(r => r.getLong(1) ->
      ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(5)))).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L), s"all corpus docs fuse: $byDoc")
    // the both-axes doc wins the fusion
    assert(byDoc(1L)._3 == 1L, s"doc 1 (words + meaning) must fuse to rank 1: $byDoc")
    // word-only doc: lexical rank present, semantic far (orthogonal)
    assert(byDoc(2L)._1.nonEmpty, s"doc 2 must appear in the lexical list: $byDoc")
    // meaning-only doc: NO lexical rank (zero shared tokens), strong sem
    assert(byDoc(3L)._1.isEmpty && byDoc(3L)._2.contains(2L),
      s"doc 3 must be semantic-only at sem rank 2: $byDoc")
    // RRF dominance ordering: fused rank of doc 3 beats doc 4 (unrelated)
    assert(byDoc(3L)._3 < byDoc(4L)._3, s"meaning-only must out-fuse unrelated: $byDoc")
  }

  test("t30: IVF-shortlist hybrid keeps most of t20's exact fused top-10 (recall delta recorded)") {
    // t30 trades t20's exact brute-force semantic leg for e4's 8-probe
    // IVF shortlist — the production composition. The price is recall
    // against the exact fusion; this spec MEASURES it (driver testdata,
    // sf0.01) and gates a floor: per-query top-10 overlap >= 0.5, mean
    // >= 0.6. Measured at round 9: per-query 0.70-0.90, mean 0.80 —
    // i.e. the shortlist swap costs ~2 of 10 fused results, the e4
    // recall contract carried through the fusion.
    val sf01 = "/root/testdata/sf0.01"
    def top10(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf01)
        .select(col("q_id"), col("doc_id")).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top10("t20_hybrid_rrf")
    val ann = top10("t30_hybrid_ann_rrf")
    assert(exact.keySet == ann.keySet, "query sets must match")
    val overlaps = exact.map { case (q, docs) =>
      val o = (docs & ann(q)).size.toDouble / docs.size
      assert(o >= 0.5, f"t30 lost too much of t20's top-10 for query $q: $o%.2f")
      o
    }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.6, f"mean t30-vs-t20 top-10 overlap $mean%.2f below floor")
    info(f"t30 vs t20 top-10 overlap: mean $mean%.2f over ${overlaps.size} queries")
  }

  test("t31: high-perplexity docs land in the dropped tail tercile, fluent docs keep") {
    // 6 fluent docs are pure bigram repetition (every bigram's count
    // equals its context mass → nll 0); 3 gibberish docs spread many
    // distinct continuations over the shared context token 'x', so each
    // of their bigrams pays ln(c1(x)) — strictly positive. ntile(3)
    // over 9 docs in one language gives 3/3/3; the gibberish trio must
    // BE the tail (bucket 3, keep = false), CCNet's drop set.
    val fluent = (0L until 6L).map(i => (i, "y z " * 8 + "y z"))
    val gibberish = (10L until 13L).map(i =>
      (i, (0 until 8).map(j => s"x q${i}_$j").mkString(" ")))
    val dir = docsDir(fluent ++ gibberish)
    val byDoc = SparkEntry.queries("t31_perplexity_buckets")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Boolean]("keep"))).toMap
    for (i <- 10L until 13L)
      assert(byDoc(i) == (3L, false), s"gibberish doc $i not in the tail: ${byDoc(i)}")
    for (i <- 0L until 6L)
      assert(byDoc(i)._2, s"fluent doc $i was dropped: ${byDoc(i)}")
  }

  test("t26: unaligned cross-doc overlap merges to one span; within-doc repetition excluded") {
    // shared = a 12-token passage (5 duplicated 8-grams, positions merge
    // into ONE span) planted at DIFFERENT offsets in docs 1 and 2 — the
    // unaligned case t12's fixed chunks miss. filler8 repeats an 8-gram
    // TWICE inside doc 3 only: within-doc repetition must NOT be a span.
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val selfRep = (1 to 8).map(i => s"own$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> s"a1 a2 a3 $shared z1 z2",
      2L -> s"b1 $shared y1 y2 y3 y4",
      3L -> s"$selfRep mid1 mid2 $selfRep tail1"))
    val rows = SparkEntry.queries("t26_dup_span_removal")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: shared occupies tokens 4..15 → grams at 4..8 merge to [4,15]
    // doc 2: shared occupies tokens 2..13 → grams at 2..6 merge to [2,13]
    assert(rows.toSet == Set((1L, 4L, 15L, 12L, 5L), (2L, 2L, 13L, 12L, 5L)),
      s"exactly one merged 12-token span per sharing doc, none for doc 3: ${rows.toSeq}")
  }

  test("t26: two distant shared passages stay two spans; adjacent grams merge") {
    // docs 1/2 share an 8-gram at the start AND another near the end,
    // separated by >8 unshared tokens — must come out as TWO spans each
    val p1 = (1 to 8).map(i => s"p$i").mkString(" ")
    val p2 = (1 to 8).map(i => s"q$i").mkString(" ")
    val dir = docsDir(Seq(
      1L -> s"$p1 f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 $p2",
      2L -> s"$p1 g1 g2 g3 g4 g5 g6 g7 g8 g9 g10 $p2"))
    val rows = SparkEntry.queries("t26_dup_span_removal")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.count(_._1 == 1L) == 2 && rows.count(_._1 == 2L) == 2,
      s"distant passages must not merge across the gap: ${rows.toSeq}")
    assert(rows.toSet == Set(
      (1L, 1L, 8L, 8L, 1L), (1L, 19L, 26L, 8L, 1L),
      (2L, 1L, 8L, 8L, 1L), (2L, 19L, 26L, 8L, 1L)), s"span bounds: ${rows.toSeq}")
  }
}
