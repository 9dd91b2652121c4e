package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Dedup

/** End-to-end parity between the two MinHash/LSH hash kernels: the
  * portable md5 kernel (oracle-checked configuration, what d2/d3 declare)
  * and the engine-native xxhash64 kernel (the 100 TB configuration —
  * ~20× less hash CPU, same operator shapes). The pair OUTPUT of the
  * banded pipeline must be kernel-agnostic on a corpus whose similarity
  * structure is unambiguous: exact duplicates (est_sim 1 under any
  * kernel) against near-orthogonal random docs (expected token overlap
  * ≪ 1, so neither kernel can band-collide or pass the 0.5 threshold).
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    val rnd = new Random(20260813)
    val base = (0 until 120).map { i =>
      val text = Seq.fill(40)(s"w${rnd.nextInt(5000)}").mkString(" ")
      (i.toLong, text)
    }
    val dups = (0 until 20).map(i => (1000L + i, base(i)._2))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("xxhash64 and md5 kernels produce the same LSH pair set at the same threshold") {
    val docs = corpus()
    val portable = Dedup.lshPairs(docs) // defaults: the d3 configuration
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Dedup.lshPairs(docs, xxhashKernel, xxhashBandKernel)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(portable == planted,
      s"portable kernel: ${portable.diff(planted)} extra / ${planted.diff(portable)} missing")
    assert(native == planted,
      s"native kernel: ${native.diff(planted)} extra / ${planted.diff(native)} missing")
  }

  /** Corpus shaped for the d9/st14 admission semantics: doc_id % 5 == 0
    * plays the incoming batch; corpus-side copies (ids 1001–1004, none
    * divisible by 5) of four NEW docs plant exact dups the admission
    * must catch under either kernel. */
  private def admissionCorpus() = {
    val rnd = new Random(7)
    val base = (0 until 120).map { i =>
      (i.toLong, Seq.fill(40)(s"w${rnd.nextInt(5000)}").mkString(" "))
    }
    val copies = (0 until 4).map(i => (1001L + i, base(i * 5)._2))
    (base ++ copies).toDF("doc_id", "text")
  }

  test("d9 incremental dedup: xxhash64 and md5 banded kernels agree row-for-row") {
    val docs = admissionCorpus()
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toSet
    val portable = run(Dedup.incrementalDedup(docs))
    val native = run(Dedup.incrementalDedup(docs, xxhashKernel, xxhashBandKernel))
    assert(portable == native,
      s"portable-only ${portable -- native}, native-only ${native -- portable}")
    // the planted corpus copies must be flagged under both kernels
    val flagged = portable.filter(_._2).map(_._1)
    assert(flagged == Set(0L, 5L, 10L, 15L), s"exact dups flagged: $flagged")
    assert(portable.filter(r => Set(0L, 5L, 10L, 15L)(r._1)).forall(_._3 >= 1L),
      "exact dups must also band-collide with their corpus twin")
  }

  test("d11 contamination matrix: xxhash64 and md5 banded kernels agree") {
    val docs = corpus().withColumn("source",
      when(col("doc_id") < 1000, "crawlA").otherwise("crawlB"))
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val portable = run(Dedup.sourceOverlap(docs))
    val native = run(Dedup.sourceOverlap(docs, xxhashKernel, xxhashBandKernel))
    val expected = Map(("crawlA", "crawlB") -> 20L) // the 20 planted cross-source dups
    assert(portable == expected, s"portable matrix: $portable")
    assert(native == expected, s"native matrix: $native")
  }

  test("st14 corpus admission: md5 and xxhash64 fingerprints admit the same doc_ids") {
    // match the testdata layout: documents.parquet is a single FILE (the
    // streaming source symlinks it), not a directory
    val dir = java.nio.file.Files.createTempDirectory("graft_st14_par_").toString
    val scratch = java.nio.file.Files.createTempDirectory("graft_st14_w_").toString
    admissionCorpus()
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("crawl").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    def admitted(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val portable = admitted(graft.queries.Streaming.corpusAdmission(spark, dir))
    val native = admitted(graft.queries.Streaming.corpusAdmission(spark, dir,
      graft.functions.TextFunctions.fingerprintNative))
    val expectedNew = (0L until 120L).filter(_ % 5 == 0).toSet -- Set(0L, 5L, 10L, 15L)
    assert(portable == expectedNew, s"portable admitted: ${portable -- expectedNew} extra, " +
      s"${expectedNew -- portable} missing")
    assert(native == expectedNew, s"native admitted: ${native -- expectedNew} extra, " +
      s"${expectedNew -- native} missing")
  }

  test("tokenize_ws == filter(split(lower(trim)))) and word_shingles == transform chain") {
    val rnd = new Random(4242)
    val texts = (0 until 300).map { _ =>
      val n = rnd.nextInt(12)
      Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
        .mkString(Seq(" ", "  ", "\t", "\n", " \t ")(rnd.nextInt(5)))
    } ++ Seq("", " ", "\t\n", "  Mixed CASE  words ", "täst ÜNÏCODE ✓ x",
      "one", "a b", "trailing space ", " nbsp stays one token")
    val df = texts.toDF("text")
    val oldToks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    def oldShingles(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    for (n <- Seq(2, 3, 5)) {
      val bad = df.select(col("text"),
          tokens(col("text")).as("nt"), oldToks.as("ot"),
          shingles(col("text"), n).as("ns"), oldShingles(oldToks, n).as("os"))
        .filter(not(col("nt") === col("ot")) || not(col("ns") === col("os")))
        .collect()
      assert(bad.isEmpty, s"n=$n divergence on: ${bad.map(_.getString(0)).mkString("|")}")
    }
  }

  test("portable_minhash60 == per-seed array_min(transform) minima") {
    val docs = corpus()
    // a kernel that is value-equal to portableKernel but not `eq` it, so
    // minhashSignature takes the generic per-seed path
    val genericPortable: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
      (s, seed) => portableKernel(s, seed)
    val bad = docs
      .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
      .select(col("doc_id"),
        minhashSignature(col("sh"), 16, portableKernel).as("fast"),
        minhashSignature(col("sh"), 16, genericPortable).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .collect()
    assert(bad.isEmpty, s"signature divergence on ids ${bad.map(_.getLong(0)).mkString(",")}")
    // empty shingle input: all-null signature, matching array_min-on-empty
    val row = Seq(Tuple1(Array.empty[String])).toDF("sh")
      .select(minhashSignature(col("sh"), 4, portableKernel).as("sig"))
      .collect()(0).getSeq[Any](0)
    assert(row.size == 4 && row.forall(_ == null), s"empty-input signature was $row")
  }

  test("sig_agree == size(filter(zip_with)) chain, nulls and length mismatch included") {
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 9L, 3L, 4L)),
      (2L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (3L, Seq[java.lang.Long](5L, 6L), Seq[java.lang.Long](5L, 6L, 7L)),
      (4L, Seq.empty[java.lang.Long], Seq[java.lang.Long](1L)),
      (5L, Seq[java.lang.Long](null), Seq[java.lang.Long](null)))
      .toDF("id", "a", "b")
    val chain = size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), p => p))
    val bad = rows.select(col("id"),
        call_function("sig_agree", col("a"), col("b")).as("fast"), chain.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(bad.isEmpty, s"sig_agree divergence on ids ${bad.map(_.getLong(0)).mkString(",")}")
  }

  test("bpe_class_counts == regexp_extract_all + filter/rlike chain") {
    val rnd = new Random(11)
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => rnd.nextInt(5) match {
        case 0 => rnd.alphanumeric.filter(_.isLetter).take(3).mkString
        case 1 => rnd.nextInt(1000).toString
        case 2 => Seq(",", "!", "?", ";", "#")(rnd.nextInt(5))
        case 3 => " "
        case _ => "mix3d t0k3n"
      }).mkString
    } ++ Seq("", "   ", "abc", "123", "!!!", "a1! b2? ünïcode ✓ x9",
      // vertical tab: the ONE char where Java \s and RE2 \s disagree —
      // the kernel spells the class out to match the DuckDB oracle, and
      // this reference chain must use the same explicit spelling (with a
      // bare \s here, Spark's Java regex would skip the VT the kernel
      // now counts as punct)
      "a\u000Bb")
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\t\\n\\f\\r ]"
    val toks = regexp_extract_all(col("text"), lit(pat), lit(0))
    val c = call_function("bpe_class_counts", col("text"))
    val bad = texts.toDF("text").select(col("text"),
        c.getField("n").as("fn"), size(toks).as("sn"),
        c.getField("alpha").as("fa"),
        size(filter(toks, t => t.rlike("^[A-Za-z]"))).as("sa"),
        c.getField("digit").as("fd"),
        size(filter(toks, t => t.rlike("^[0-9]"))).as("sd"),
        c.getField("punct").as("fp"),
        size(filter(toks, t => t.rlike("^[^A-Za-z0-9]"))).as("sp"))
      .filter(col("fn") =!= col("sn") || col("fa") =!= col("sa") ||
        col("fd") =!= col("sd") || col("fp") =!= col("sp"))
      .collect()
    assert(bad.isEmpty, s"bpe class divergence on: ${bad.map(_.getString(0)).mkString("|")}")
  }

  test("array_max_count == array_max(transform(array_distinct, filter-count)) chain") {
    val rnd = new Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(s"t${rnd.nextInt(8)}"))
    } :+ ((999L, Seq("only"))) :+ ((1000L, Seq("a", "a", "a"))) :+
      // null elements count 0 in BOTH: the chain's `x = t` filter drops
      // them; the kernel must skip them the same way (two nulls must not
      // out-vote the single real token)
      ((1001L, Seq("a", null, null)))
    val df = rows.toDF("id", "arr")
    val chain = array_max(transform(array_distinct(col("arr")),
      t => size(filter(col("arr"), x => x === t))))
    val bad = df.select(col("id"),
        call_function("array_max_count", col("arr")).as("fast"), chain.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(bad.isEmpty, s"max-count divergence on ids ${bad.map(_.getLong(0)).mkString(",")}")
  }

  test("portable_simhash60 == SQL-lambda vote chain") {
    val docs = corpus().select(col("doc_id"), tokens(col("text")).as("toks"))
    val ph = "portable_hash60(t, 't:')"
    val counts =
      s"""aggregate(toks, array_repeat(0L, 60),
            (acc, t) -> zip_with(acc,
              transform(sequence(0, 59),
                i -> CASE WHEN ($ph & shiftleft(1L, i)) != 0
                          THEN 1L ELSE -1L END),
              (a, b) -> a + b))"""
    val lambdaChain = expr(
      s"""aggregate(
            zip_with($counts, sequence(0, 59),
              (c, i) -> CASE WHEN c > 0L THEN shiftleft(1L, i) ELSE 0L END),
            0L, (a, b) -> a + b)""")
    val bad = docs
      .select(col("doc_id"), simhashPortable60("toks").as("fast"), lambdaChain.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(bad.isEmpty, s"simhash divergence on ids ${bad.map(_.getLong(0)).mkString(",")}")
    // empty token array: zero votes everywhere -> signature 0
    val z = Seq(Tuple1(Array.empty[String])).toDF("toks")
      .select(simhashPortable60("toks")).collect()(0).getLong(0)
    assert(z == 0L, s"empty-input simhash was $z")
  }

  test("portable_hash60 expression == built-in md5 chain == JVM scalar twin") {
    val rnd = new Random(99)
    val strs = (0 until 500).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString) ++
      Seq("", " ", "täst ünïcode ✓", "a b  c")
    val df = strs.toDF("s")
    val rows = df.select(col("s"),
      call_function("portable_hash60", col("s"), lit("7:")).as("native"),
      conv(substring(md5(concat(lit("7:"), col("s"))), 1, 15), 16, 10)
        .cast("long").as("builtin"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"expression diverged from built-in chain on '${r.getString(0)}'")
      assert(r.getLong(1) == portableHash60(s"7:${r.getString(0)}"),
        s"expression diverged from scalar twin on '${r.getString(0)}'")
    }
  }

  test("native-kernel signatures equal independently computed per-seed minima") {
    // pins minhashSignature's array/transform plumbing under xxhash64:
    // sig[seed] must equal min over the doc's shingles of
    // xxhash64(shingle, seed), recomputed via an explode + groupBy path
    val docs = corpus().limit(30)
    val sh = docs.withColumn("sh", shingles(col("text"), 2))
      .filter(size(col("sh")) > 0)
    val viaOp = sh
      .select(col("doc_id"),
        minhashSignature(col("sh"), 4, xxhashKernel).as("sig"))
    val viaExplode = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id")
      .agg(array((0 until 4).map(seed =>
        min(xxhash64(col("s"), lit(seed)))): _*).as("sig2"))
    val joined = viaOp.join(viaExplode, "doc_id")
      .filter(col("sig") =!= col("sig2"))
    assert(joined.count() == 0, "operator signature diverged from ground truth")
  }
}
