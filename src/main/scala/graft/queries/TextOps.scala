package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** LLM-training-pipeline text analysis over the `documents` table
  * (driver north-star; no reference counterpart — designed Spark-first):
  * per-document stats, quality scoring, language ID heuristic,
  * fingerprinting, and corpus token frequency.
  *
  * Scale notes: t1–t4 are row-local projections (zero shuffles — at 100 TB
  * these run at scan speed and partition-prune on any date/source layout).
  * t5 is the classic explode+count: one shuffle keyed by token; its top-k
  * is TakeOrderedAndProject, never a global sort. Ratios are floor-scaled
  * (never round()) for engine-independence.
  */
object TextOps extends QueryGroup {

  private val sqlTokens =
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')"

  /** t25/st16's pinned sketch width — a workload knob like t22's shard
    * count; both the Spark booleans and the oracle literal use it. */
  private[queries] val HhK = 32

  /** Shared guarantee-audit tail of t25 and st16: exact top-10 token
    * counts joined against one drained sketch row
    * (`sk: array<struct<token,est>>`, `n_total`) — outputs exact values
    * plus the Misra–Gries capture/error-bound booleans (TRUE under any
    * partitioning; the oracle hash-gates them). */
  private[queries] def heavyHitterAudit(
      tok: org.apache.spark.sql.DataFrame,
      sketchRow: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val est = sketchRow.select(explode(col("sk")).as("e"))
      .select(col("e.token").as("token"), col("e.est").as("est"))
    val exact = tok.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token")).limit(10)
    exact
      .join(est, Seq("token"), "left")
      .crossJoin(broadcast(sketchRow.select(col("n_total"))))
      .select(col("token"), col("exact_cnt"),
        (col("exact_cnt") * HhK > col("n_total")).as("heavy"),
        (!(col("exact_cnt") * HhK > col("n_total")) || col("est").isNotNull)
          .as("captured_ok"),
        (col("est").isNull ||
          (col("est") <= col("exact_cnt") &&
            (col("exact_cnt") - col("est")) * HhK <= col("n_total")))
          .as("est_ok"))
  }
  private val sqlStop =
    "('the','a','of','to','and','in','is','for','on','with','row','table','value','key')"

  /** t2's quality score, shared with the t6 training-mix sampler and
    * d15's quality-aware canonical selection:
    * +2/token (cap 100), −5/punct char (floor −50), +1/distinct token
    * (cap 40), +20 length-band bonus — all integer arithmetic. */
  private[queries] def qualityScore: org.apache.spark.sql.Column = {
    val nt = nTokens(col("text"))
    least(nt * 2L, lit(100L)) +
      greatest(lit(0L) - punctCount(col("text")) * 5L, lit(-50L)) +
      least(size(tokenSet(col("text"))).cast("long"), lit(40L)) +
      when(col("n_chars").between(200, 400), 20L).otherwise(0L)
  }

  private[queries] val sqlQualityScore =
    s"""least(len($sqlTokens) * 2, 100)
        + greatest(0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 5, -50)
        + least(len(list_distinct($sqlTokens)), 40)
        + CASE WHEN n_chars BETWEEN 200 AND 400 THEN 20 ELSE 0 END"""

  /** t32's fixed hashed-feature space: 2^16 buckets — the DSIR paper's
    * hashing-trick sizing, declared once so the Spark plan and the DuckDB
    * oracle share the literal. */
  private[graft] val DsirBuckets = 65536L

  def defs: Map[String, QueryDef] = Map(
    // T1: per-document stats — token count, char count, punctuation count,
    // stopword count/ratio, average token length.
    "t1_text_stats" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
        doc.select(
          col("doc_id"),
          nTokens(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_calc"),
          punctCount(col("text")).as("punct_cnt"),
          stopwordCount(col("text")).as("stopword_cnt"),
          // try_divide: a zero-token document must yield NULL ratios like
          // DuckDB's x/0, not a Spark-side NaN->0 (or an ANSI abort)
          (floor(try_divide(stopwordCount(col("text")).cast("double"),
            nTokens(col("text")).cast("double")) * 10000) / 10000.0).as("stopword_ratio"),
          (floor(try_divide(
            length(regexp_replace(col("text"), "\\s+", "")).cast("double"),
            nTokens(col("text")).cast("double")) * 10000) / 10000.0).as("avg_token_len"))
      },
      oracle = Some(s"""
        SELECT doc_id,
               len($sqlTokens) AS n_tokens,
               length(text) AS n_chars_calc,
               length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_cnt,
               len(list_filter($sqlTokens, x -> x IN $sqlStop)) AS stopword_cnt,
               floor(CAST(len(list_filter($sqlTokens, x -> x IN $sqlStop)) AS DOUBLE)
                     / len($sqlTokens) * 10000) / 10000.0 AS stopword_ratio,
               floor(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                     / len($sqlTokens) * 10000) / 10000.0 AS avg_token_len
        FROM documents""")),

    // T2: quality score — integer-unit weighted combination of the t1
    // signals, with a keep/flag verdict (the training-data filter shape).
    "t2_quality_score" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
        val score = qualityScore
        doc.select(
          col("doc_id"), score.as("quality_score"),
          when(score >= 120, "keep").when(score >= 60, "review")
            .otherwise("drop").as("verdict"))
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT doc_id, $sqlQualityScore AS quality_score
          FROM documents)
        SELECT doc_id, quality_score,
               CASE WHEN quality_score >= 120 THEN 'keep'
                    WHEN quality_score >= 60 THEN 'review'
                    ELSE 'drop' END AS verdict
        FROM scored""")),

    // T3: language-ID heuristic — marker-word hit counts per language,
    // argmax with a fixed precedence on ties.
    "t3_lang_id" -> QueryDef(
      build = (s, d) => {
        def hits(markers: Seq[String]) =
          size(filter(tokens(col("text")), t => t.isInCollection(markers))).cast("long")
        val en = hits(Seq("the", "a", "of", "and", "is", "to"))
        val de = hits(Seq("der", "die", "und", "das", "ist", "ein"))
        val fr = hits(Seq("le", "la", "et", "les", "des", "est"))
        Tables.documents(s, d).select(
          col("doc_id"), en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
          when(en >= de && en >= fr, "en")
            .when(de >= fr, "de").otherwise("fr").as("lang_pred"),
          col("lang").as("lang_label"))
      },
      oracle = Some(s"""
        WITH hits AS (
          SELECT doc_id, lang,
                 len(list_filter($sqlTokens, x -> x IN ('the','a','of','and','is','to'))) AS en_hits,
                 len(list_filter($sqlTokens, x -> x IN ('der','die','und','das','ist','ein'))) AS de_hits,
                 len(list_filter($sqlTokens, x -> x IN ('le','la','et','les','des','est'))) AS fr_hits
          FROM documents)
        SELECT doc_id, en_hits, de_hits, fr_hits,
               CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                    WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_pred,
               lang AS lang_label
        FROM hits""")),

    // T4: document fingerprint (md5 of normalized text) + duplicate-group
    // size per fingerprint.
    "t4_fingerprint" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        val groups = doc.groupBy("fp").agg(count(lit(1)).as("dup_cnt"))
        doc.join(groups, "fp").select("doc_id", "fp", "dup_cnt")
      },
      oracle = Some("""
        WITH fps AS (
          SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM documents)
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dup_cnt
        FROM fps""")),

    // T5: corpus token frequency — explode + count + top-k (wordcount).
    "t5_token_topk" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(desc("freq"), asc("token"))
          .limit(20),
      oracle = Some(s"""
        SELECT token, count(*) AS freq
        FROM (SELECT unnest($sqlTokens) AS token FROM documents)
        GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20"""),
      bench = true),

    // T6: stratified training-mix sampler — per (source, lang) stratum,
    // keep the top-`quota` docs by quality score (t2's scoring) with a
    // doc_id tiebreak. One partitioned window after a key shuffle; at
    // 100 TB each stratum sorts independently (no global sort), and a
    // stratum bigger than memory would switch to per-stratum
    // TakeOrderedAndProject or a sampled threshold — same output contract.
    "t6_training_mix" -> QueryDef(
      build = (s, d) => {
        val quota = 25
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("lang"))
          .orderBy(desc("quality_score"), asc("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            qualityScore.as("quality_score"))
          .withColumn("mix_rank", row_number().over(w).cast("long"))
          .filter(col("mix_rank") <= quota)
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT doc_id, source, lang, $sqlQualityScore AS quality_score
          FROM documents)
        SELECT doc_id, source, lang, quality_score, mix_rank
        FROM (SELECT *, row_number() OVER (PARTITION BY source, lang
                ORDER BY quality_score DESC, doc_id ASC) AS mix_rank
              FROM scored)
        WHERE mix_rank <= 25""")),

    // T7: document chunking — fixed-size token windows (50 tokens, stride
    // 40 → 10-token overlap), the training-example splitter. Pure row-local
    // explode: zero shuffles, runs at scan speed at any scale.
    "t7_chunks" -> QueryDef(
      build = (s, d) => {
        val chunk = 50
        val stride = 40
        Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
          .select(
            col("doc_id"),
            floor(col("start") / stride.toDouble).cast("long").as("chunk_idx"),
            least(lit(chunk.toLong), (size(col("toks")) - col("start")).cast("long"))
              .as("n_chunk_tokens"),
            concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunk)))
              .as("chunk_text"))
      },
      oracle = Some(s"""
        WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents
                   WHERE len($sqlTokens) > 0)
        SELECT doc_id,
               CAST(start // 40 AS BIGINT) AS chunk_idx,
               CAST(least(50, len(toks) - start) AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(toks, start + 1, start + 50), ' ') AS chunk_text
        FROM t, unnest(range(0, len(toks), 40)) AS u(start)"""))
      ,

    // T8: benchmark decontamination — the training-corpus hygiene step
    // every LLM pipeline runs before training: flag corpus documents that
    // share any exact token 5-gram with a held-out benchmark set (here:
    // doc_id % 50 == 0, the deterministic stand-in for an eval suite).
    // Shape: explode distinct 5-gram shingles on both sides, inner-join on
    // the shingle, per-doc aggregate, left-join back so every corpus doc
    // reports (clean docs hash-check too). At 100 TB the benchmark side is
    // tiny by construction — broadcast it; the corpus side is one explode
    // + one map-side-combinable aggregate, never an all-pairs comparison.
    "t8_decontaminate" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
        // materialized once: both the benchmark side and the corpus side
        // consume this subtree, and the differing downstream shapes block
        // ReusedExchange (same hazard SimilarityJoin documents) — without
        // this the corpus-wide tokenize+explode runs twice
        val sh = doc.select(col("doc_id"),
          explode(array_distinct(shingles(col("text"), 5))).as("g"))
          .localCheckpoint(true)
        val benchSh = sh.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("g"))
        val hits = sh.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(benchSh), "g")
          .groupBy("doc_id")
          .agg(countDistinct("g").as("shared"),
            countDistinct("bench_id").as("bench"))
        doc.filter(col("doc_id") % 50 =!= 0).select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("shared"), lit(0L)).as("n_shared_5grams"),
            coalesce(col("bench"), lit(0L)).as("n_bench_docs"),
            (coalesce(col("shared"), lit(0L)) > 0L).as("contaminated"))
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, $sqlTokens AS t FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 3, 1)),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS g
          FROM toks),
        hits AS (
          SELECT c.doc_id,
                 count(DISTINCT c.g) AS shared,
                 count(DISTINCT b.doc_id) AS bench
          FROM sh c JOIN sh b USING (g)
          WHERE c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
          GROUP BY c.doc_id)
        SELECT d.doc_id,
               coalesce(shared, 0) AS n_shared_5grams,
               coalesce(bench, 0) AS n_bench_docs,
               coalesce(shared, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits USING (doc_id)
        WHERE d.doc_id % 50 <> 0""")),

    // T9: boilerplate detection via corpus-common n-grams (the
    // MassiveText/Gopher-style repetition filter): a 3-gram is boilerplate
    // when it appears in >= 5 distinct documents; each doc reports what
    // fraction of its distinct 3-grams are boilerplate. Shape: one explode,
    // document-frequency via map-side-combinable groupBy, broadcast-able
    // join back (only 3-grams with df >= threshold matter — at 100 TB,
    // semi-join the tiny hot-gram set instead of the full df table).
    "t9_boilerplate_ngrams" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
        // materialized once — consumed by both the document-frequency
        // aggregate and the join-back (see t8's note)
        val sh = doc.select(col("doc_id"),
          explode(array_distinct(shingles(col("text"), 3))).as("g"))
          .localCheckpoint(true)
        val dfreq = sh.groupBy("g").agg(countDistinct("doc_id").as("nd"))
        val per = sh.join(dfreq, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n3"),
            sum(when(col("nd") >= 5, 1L).otherwise(0L)).as("nc"))
        doc.select("doc_id")
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n3"), lit(0L)).as("n_3grams"),
            coalesce(col("nc"), lit(0L)).as("n_boilerplate"),
            coalesce(
              floor(col("nc").cast("double") / col("n3").cast("double") * 10000) / 10000.0,
              lit(0.0)).as("boilerplate_ratio"))
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, $sqlTokens AS t FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 1, 1)),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
          FROM toks),
        dfq AS (SELECT g, count(DISTINCT doc_id) AS nd FROM sh GROUP BY g),
        per AS (
          SELECT doc_id, count(*) AS n3,
                 CAST(sum(CASE WHEN nd >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS nc
          FROM sh JOIN dfq USING (g)
          GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(n3, 0) AS n_3grams,
               coalesce(nc, 0) AS n_boilerplate,
               coalesce(floor(CAST(nc AS DOUBLE) / n3 * 10000) / 10000.0, 0.0) AS boilerplate_ratio
        FROM documents d LEFT JOIN per USING (doc_id)""")),

    // T10: BPE-ish pre-tokenization counts — the GPT-2-style regex split
    // (letter runs | digit runs | single punctuation) that LLM pipelines
    // use to estimate token budgets before running a real BPE. Row-local,
    // zero shuffles, runs at scan speed. The oracle writes the class as
    // RE2 \s; the kernel spells the same set out explicitly
    // ([\t\n\f\r ]) because Java \s also includes vertical tab — the
    // one char the two engines' \s disagree on (KernelParitySpec plants
    // a VT to pin it).
    "t10_bpe_token_counts" -> QueryDef(
      build = (s, d) => {
        // one native matcher pass (KernelParitySpec pins it against the
        // four-expression regexp_extract_all + filter/rlike chain)
        val c = call_function("bpe_class_counts", col("text"))
        Tables.documents(s, d).select(
          col("doc_id"),
          c.getField("n").cast("long").as("n_bpe_tokens"),
          c.getField("alpha").cast("long").as("n_alpha_runs"),
          c.getField("digit").cast("long").as("n_digit_runs"),
          c.getField("punct").cast("long").as("n_punct"))
      },
      oracle = Some("""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
               len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                   t -> regexp_matches(t, '^[A-Za-z]'))) AS n_alpha_runs,
               len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                   t -> regexp_matches(t, '^[0-9]'))) AS n_digit_runs,
               len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
                   t -> regexp_matches(t, '^[^A-Za-z0-9]'))) AS n_punct
        FROM documents""")),

    // T11: repetition profile — the Gopher-style repetition quality
    // signals (Rae et al. 2021 §A1.1: "fraction of characters in the most
    // frequent n-gram", "fraction of duplicate n-grams") adapted to token
    // space: most-frequent-token share, most-frequent-bigram share, and
    // duplicate-bigram fraction, plus an is_repetitive flag. Entirely
    // row-local (zero shuffles — runs at scan speed at 100 TB); the flag
    // compares in INTEGER space (cnt·100 > n·threshold), never floats, so
    // boundary docs can't flip between engines. Per-row cost is O(d²) in
    // distinct tokens — bounded by chunking upstream (t7), not a scale
    // concern for document-sized rows.
    "t11_repetition_profile" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"),
            shingles(col("text"), 2).as("bg"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(col("bg")).cast("long").as("n_bigrams"),
            // native one-pass multiplicity kernel; the transform(filter)
            // chain it replaces was O(distinct x n) interpreted per row.
            // Guarded so empty input stays null like array_max-on-empty
            when(size(col("toks")) > 0,
              call_function("array_max_count", col("toks")).cast("long"))
              .as("top_token_cnt"),
            when(size(col("bg")) > 0,
              call_function("array_max_count", col("bg")).cast("long"))
              .as("top_bigram_cnt"),
            when(size(col("bg")) > 0,
              (size(col("bg")) - size(array_distinct(col("bg")))).cast("long"))
              .as("dup_bigram_cnt"))
        doc.select(col("doc_id"), col("n_tokens"), col("top_token_cnt"),
          col("top_bigram_cnt"), col("dup_bigram_cnt"),
          (floor(col("top_token_cnt") * 10000.0 / col("n_tokens")) / 10000.0)
            .as("top_token_frac"),
          when(col("n_bigrams") > 0,
            floor(col("dup_bigram_cnt") * 10000.0 / col("n_bigrams")) / 10000.0)
            .as("dup_bigram_frac"),
          (col("top_token_cnt") * 100 > col("n_tokens") * 20 ||
            (col("n_bigrams") > 0 && col("top_bigram_cnt") * 100 > col("n_bigrams") * 10))
            .as("is_repetitive"))
      },
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, $sqlTokens AS toks,
                 list_transform(range(1, len($sqlTokens)),
                   i -> $sqlTokens[i] || ' ' || $sqlTokens[i + 1]) AS bg
          FROM documents),
        c AS (
          SELECT doc_id,
                 len(toks) AS n_tokens, len(bg) AS n_bigrams,
                 list_max(list_transform(list_distinct(toks),
                   t -> len(list_filter(toks, x -> x = t)))) AS top_token_cnt,
                 CASE WHEN len(bg) > 0 THEN
                   list_max(list_transform(list_distinct(bg),
                     b -> len(list_filter(bg, x -> x = b)))) END AS top_bigram_cnt,
                 CASE WHEN len(bg) > 0 THEN len(bg) - len(list_distinct(bg)) END AS dup_bigram_cnt
          FROM t)
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(top_token_cnt AS BIGINT) AS top_token_cnt,
               CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
               CAST(dup_bigram_cnt AS BIGINT) AS dup_bigram_cnt,
               floor(top_token_cnt * 10000.0 / n_tokens) / 10000.0 AS top_token_frac,
               CASE WHEN n_bigrams > 0
                    THEN floor(dup_bigram_cnt * 10000.0 / n_bigrams) / 10000.0 END AS dup_bigram_frac,
               (top_token_cnt * 100 > n_tokens * 20 OR
                (n_bigrams > 0 AND top_bigram_cnt * 100 > n_bigrams * 10)) AS is_repetitive
        FROM c""")),

    // T12: sub-document (chunk-level) exact dedup across the corpus — the
    // pipeline step between whole-doc dedup (d1) and near-dup (d2–d5):
    // split every document into non-overlapping 10-token chunks,
    // fingerprint each (portable md5), elect one keeper per fingerprint
    // (lexicographic min (doc_id, chunk_idx) — deterministic under any
    // partitioning), and report per-document kept/duplicate chunk counts.
    // Two keyed shuffles (fingerprint, then doc_id), both map-side
    // combinable; the keeper election is a groupBy, never a window over
    // a hot fingerprint. At 100 TB the fp join is AQE-skew-splittable and
    // the payload never shuffles — only (doc_id, chunk_idx, 16-byte fp).
    "t12_chunk_dedup" -> QueryDef(
      build = (s, d) => {
        val chunk = 10
        val ch = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), size(col("toks")) - 1, lit(chunk))).as("start"))
          .select(col("doc_id"),
            (col("start") / chunk).cast("long").as("chunk_idx"),
            md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunk))))
              .as("fp"))
        val keeper = ch.groupBy("fp")
          .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("k"))
        ch.join(keeper, "fp")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("doc_id") === col("k.doc_id") &&
              col("chunk_idx") === col("k.chunk_idx"), 1L).otherwise(0L)).as("n_kept"))
          .withColumn("n_dup_chunks", (col("n_chunks") - col("n_kept")).cast("long"))
      },
      oracle = Some(s"""
        WITH t AS (SELECT doc_id, $sqlTokens AS toks FROM documents
                   WHERE len($sqlTokens) > 0),
        ch AS (
          SELECT doc_id, CAST(start // 10 AS BIGINT) AS chunk_idx,
                 md5(array_to_string(list_slice(toks, start + 1, start + 10), ' ')) AS fp
          FROM t, unnest(range(0, len(toks), 10)) AS u(start)),
        w AS (SELECT fp, doc_id AS kd, chunk_idx AS kc FROM (
                SELECT fp, doc_id, chunk_idx,
                       row_number() OVER (PARTITION BY fp
                         ORDER BY doc_id, chunk_idx) AS rn
                FROM ch) WHERE rn = 1)
        SELECT ch.doc_id AS doc_id,
               count(*) AS n_chunks,
               CAST(sum(CASE WHEN ch.doc_id = w.kd AND ch.chunk_idx = w.kc
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(count(*) - sum(CASE WHEN ch.doc_id = w.kd AND ch.chunk_idx = w.kc
                                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
        FROM ch JOIN w ON ch.fp = w.fp
        GROUP BY ch.doc_id"""),
      bench = true),

    // T13: sequence packing — the concat-and-chunk batching step that
    // turns variable-length documents into fixed-budget training
    // sequences (seq_len 2048). Documents are laid out contiguously in
    // deterministic (doc_id) order WITHIN each source shard; a document
    // starts in pack floor(prefix_tokens / seq_len). One window keyed by
    // source (shards sort independently — no global sort) + one group-by:
    // at 100 TB each shard packs in parallel and only (doc_id, n_tokens)
    // ever shuffles, never text. Output: per-pack document/token counts
    // and the fill fraction against the token budget.
    "t13_sequence_packing" -> QueryDef(
      build = (s, d) => {
        val seqLen = 2048L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(asc("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tokens"))
          .filter(col("n_tokens") > 0)
          .withColumn("prefix_tokens",
            coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("pack_id", floor(col("prefix_tokens") / seqLen).cast("long"))
          .groupBy(col("source"), col("pack_id"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_pack_tokens"),
            min(col("doc_id")).as("first_doc_id"))
          .withColumn("fill_frac",
            floor(col("n_pack_tokens") * 10000.0 / seqLen) / 10000.0)
      },
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, source, len($sqlTokens) AS n_tokens
          FROM documents WHERE len($sqlTokens) > 0),
        laid AS (
          SELECT doc_id, source, n_tokens,
                 coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix_tokens
          FROM t)
        SELECT source, CAST(prefix_tokens // 2048 AS BIGINT) AS pack_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_pack_tokens,
               min(doc_id) AS first_doc_id,
               floor(sum(n_tokens) * 10000.0 / 2048) / 10000.0 AS fill_frac
        FROM laid
        GROUP BY 1, 2""")),

    // T14: per-document TF-IDF keyword extraction — the classic corpus
    // weighting (tf x ln((N+1)/(df+1))), top-3 terms per document.
    // Ordering uses the FLOOR-SCALED score with a token tiebreak so a
    // 1-ulp ln() divergence between engines can never flip a rank. One
    // explode + two map-side-combinable group-bys + a vocabulary join
    // (vocab ≪ corpus — broadcastable at any scale) + a per-doc window.
    "t14_tfidf_keywords" -> QueryDef(
      build = (s, d) => {
        val docs = Tables.documents(s, d)
        // N rides a broadcast 1-row aggregate (the q2 totals pattern) so
        // building the query plan triggers no driver-side action
        val nDocs = broadcast(docs.agg(
          count(lit(1)).cast("double").as("n_docs_total")))
        // materialize tf once: it feeds both the join probe side and the
        // df broadcast build, and the differing shapes block ReusedExchange
        // (the d4 prefix-table lesson) — without this the explode+agg runs twice
        val tf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("tfidf"), asc("token"))
        tf.join(broadcast(dfreq), "token")
          .crossJoin(nDocs)
          .withColumn("tfidf",
            floor(col("tf") * log((col("n_docs_total") + lit(1.0)) / (col("df") + lit(1.0)))
              * 1000000.0) / 1000000.0)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("doc_id", "rnk", "token", "tfidf")
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, token,
                 floor(tf * ln((n + 1.0) / (df + 1.0)) * 1000000) / 1000000.0 AS tfidf
          FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        SELECT doc_id, rnk, token, tfidf
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, token ASC) AS rnk FROM scored)
        WHERE rnk <= 3"""),
      bench = true),

    // T15: unigram language-model quality score — the CCNet/KenLM-style
    // perplexity filter reduced to its distributable core: train a unigram
    // LM on the corpus itself (one map-side-combinable token count), score
    // every document by its average negative log-likelihood, in
    // MICRO-NATS so the output is integer-exact across engines. Per-token
    // nll is floor-scaled BEFORE summing (ln() is the only float; its
    // 1-ulp exposure is per VOCAB ENTRY, not per document — the t14
    // discipline), and the average uses integer division of POSITIVE
    // numbers, where DuckDB's floor `//` and Spark's truncating `div`
    // agree. At 100 TB: explode+count is one keyed shuffle, the vocab is
    // ≪ corpus (broadcastable), and the per-doc re-agg is the second and
    // final shuffle. High avg_nll ⇒ rare-token salad ⇒ filter candidate.
    "t15_unigram_lm_score" -> QueryDef(
      build = (s, d) => {
        // the exploded token stream feeds the LM counts, the corpus
        // total, and the scoring probe — materialize it once
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .localCheckpoint(true)
        val lm = tok.groupBy("token").agg(count(lit(1)).as("c"))
        val total = broadcast(tok.agg(count(lit(1)).cast("double").as("t")))
        tok.join(broadcast(lm), "token")
          .crossJoin(total)
          .withColumn("nll",
            floor(-log(col("c").cast("double") / col("t")) * 1000000.0).cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("nll")).as("nll_sum"))
          .withColumn("avg_nll_micro", expr("nll_sum div n_tokens"))
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
        lm AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tok),
        scored AS (
          SELECT doc_id,
                 CAST(floor(-ln(CAST(c AS DOUBLE) / t) * 1000000) AS BIGINT) AS nll
          FROM tok JOIN lm USING (token) CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(nll) AS BIGINT) AS nll_sum,
               CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro
        FROM scored GROUP BY doc_id"""),
      bench = true),

    // PL2: the LLM-corpus pipeline END-TO-END through the declarative DAG
    // runner — bronze (quality gate drops short docs) → silver (exact
    // dedup, min-doc_id keeper per text fingerprint) → gold (per-source
    // doc/token/training-pack budget). One declared query proving the
    // DLT-style layer composes the corpus operators: quality rules,
    // content fingerprint dedup, token accounting. Every stage is a
    // single keyed shuffle; the fingerprint join is left_semi on
    // (fp, doc_id) so only 16-byte hashes + ids shuffle, never text.
    "pl2_corpus_pipeline" -> QueryDef(
      build = (s, d) => {
        val pipe = new graft.pipeline.Pipeline(s)
        pipe.table("bronze_docs",
          rules = Seq(graft.quality.Quality.Rule(
            "min_chars", "n_chars >= 150", graft.quality.Quality.Drop))) { _ =>
          Tables.documents(s, d)
        }
        pipe.table("silver_unique", deps = Seq("bronze_docs")) { in =>
          // d1's exact-dedup kernel (md5 of NORMALIZED text), so the
          // pipeline's dedup semantics match the standalone operator
          val fp = in("bronze_docs").withColumn("fp", fingerprint(col("text")))
          val keeper = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
          fp.join(keeper, Seq("fp", "doc_id"), "left_semi")
        }
        pipe.table("gold_corpus_stats", deps = Seq("silver_unique")) { in =>
          in("silver_unique")
            .select(col("source"), nTokens(col("text")).as("n_tokens"))
            .groupBy("source")
            .agg(
              count(lit(1)).as("n_docs"),
              sum(col("n_tokens")).as("n_tokens"))
            .withColumn("n_packs", expr("(n_tokens + 2047) div 2048"))
        }
        pipe.run()("gold_corpus_stats")
      },
      oracle = Some(s"""
        WITH bronze AS (SELECT * FROM documents WHERE n_chars >= 150),
        fps AS (SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                FROM bronze),
        keep AS (SELECT fp, min(doc_id) AS doc_id FROM fps GROUP BY 1),
        silver AS (SELECT f.* FROM fps f
                   JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id)
        SELECT source, count(*) AS n_docs,
               CAST(sum(len($sqlTokens)) AS BIGINT) AS n_tokens,
               CAST((sum(len($sqlTokens)) + 2047) // 2048 AS BIGINT) AS n_packs
        FROM silver GROUP BY source""")),

    // T16: Okapi BM25 retrieval scoring (k1=1.2, b=0.75) — the ranking
    // kernel behind benchmark decontamination at the passage level (t8
    // finds verbatim overlap; BM25 finds *paraphrase-shaped* leakage) and
    // behind retrieval-based corpus curation. The query is corpus-driven
    // and deterministic: the 3 highest-df tokens of length ≥ 6 (tie →
    // lexicographic), so the same definition is meaningful at every SF.
    //
    // Exactness: tf/df/dl are integers; avgdl and idf are single double
    // expressions written operation-for-operation identically in both
    // engines (ln only — the t14/t15-proven exposure); each per-(doc,term)
    // partial is floor-scaled to integer micros BEFORE the per-doc sum, so
    // aggregation order can never move a bit. Top-20 uses the total order
    // (bm25_micro DESC, doc_id ASC).
    //
    // Scale: the token stream materializes once and feeds dl/df/tf; df is
    // a distinct + map-side-combinable count; the query side is 3
    // broadcast rows (an inverted-index probe, not a scan-wide join); the
    // per-doc sum is one keyed shuffle of ≤|Q| rows per doc; top-k is
    // TakeOrderedAndProject (never a global sort). At 100 TB the df table
    // IS the inverted index: build once, broadcast the query slice.
    "t16_bm25_retrieval" -> QueryDef(
      build = (s, d) => {
        val c = bm25Corpus(s, d)
        val qterms = broadcast(c.dfTab.filter(length(col("token")) >= 6)
          .orderBy(col("df").desc, col("token").asc).limit(3))
        // tf is pre-aggregated in the corpus hub — the probe join's
        // output IS the per-(doc, term) frequency row
        val tf = c.tf.join(qterms, "token")
        tf.join(c.dl, "doc_id")
          .crossJoin(c.totals)
          .withColumn("micro", bm25Micro)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"), sum(col("micro")).as("bm25_micro"))
          .orderBy(col("bm25_micro").desc, col("doc_id").asc)
          .limit(20)
      },
      oracle = Some(s"""
        WITH $sqlBm25Ctes,
        q AS (SELECT token, df FROM dfx WHERE length(token) >= 6
              ORDER BY df DESC, token ASC LIMIT 3),
        tf AS (SELECT t.doc_id, t.token, q.df, count(*) AS tf
               FROM tok t JOIN q ON t.token = q.token
               GROUP BY 1, 2, 3),
        scored AS (
          SELECT f.doc_id, $sqlBm25Micro AS micro
          FROM tf f JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_terms,
               CAST(sum(micro) AS BIGINT) AS bm25_micro
        FROM scored GROUP BY doc_id
        ORDER BY bm25_micro DESC, doc_id ASC LIMIT 20"""),
      bench = true),

    // (t17's quota table and the rank-free 100 TB admission variant are
    // defined below the queries map: temperatureQuotas /
    // temperatureMixRankFree)

    // T17: temperature-scaled source rebalancing — the standard multi-
    // source/multilingual mixing technique (weights ∝ n^α): upweight
    // small sources, damp dominant ones, then draw a deterministic
    // pseudo-random per-source sample to quota. α = 0.5 on purpose:
    // sqrt is IEEE-correctly-rounded on BOTH engines (a general pow()
    // is not), so the single float op per source is bit-exact. The
    // quota itself is floor(wm·B/W) in IEEE double: multiply and divide
    // are correctly rounded, so both engines produce identical quotas
    // at ANY corpus size (an Int64 product wm·B would wrap silently in
    // Spark but raise in DuckDB past ~4×10⁹ docs); below 2^53 the
    // double math is exact, above it quotas stay engine-identical
    // within one doc of true — under the draw's own √quota jitter.
    // Selection inside a source orders by (content md5, doc_id) — a
    // deterministic stand-in for a uniform draw that reproduces on any
    // cluster with no RNG state.
    //
    // Scale: the per-source counts and quotas are a handful of broadcast
    // rows; the corpus pays one source-keyed rank (only (source, hash,
    // id) shuffle — text stays put via the late select). At 100 TB,
    // exact quotas (this shape) need the per-source sort; the cheap
    // variant flips to a hash-threshold admit (hash < quota/n scaled),
    // which is rank-free, at the cost of ±√quota sample-size jitter.
    "t17_temperature_mix" -> QueryDef(
      build = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val doc = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        doc
          .withColumn("rnk", row_number().over(
            w.partitionBy(col("source"))
              .orderBy(fingerprint(col("text")), col("doc_id"))).cast("long"))
          .join(temperatureQuotas(doc).select("source", "quota"), "source")
          .filter(col("rnk") <= col("quota"))
          .select("source", "doc_id", "rnk")
      },
      oracle = Some(s"""
        WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        w AS (SELECT source, n,
                     CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS wm
              FROM c),
        tot AS (SELECT CAST(sum(wm) AS BIGINT) AS W,
                       CAST(sum(n) AS BIGINT) * 2 // 5 AS B FROM w),
        q AS (SELECT source,
                     CAST(floor(CAST(wm AS DOUBLE) * CAST(B AS DOUBLE)
                                / CAST(W AS DOUBLE)) AS BIGINT) AS quota
              FROM w CROSS JOIN tot),
        ranked AS (
          SELECT source, doc_id,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
                            doc_id) AS BIGINT) AS rnk
          FROM documents)
        SELECT r.source, r.doc_id, r.rnk
        FROM ranked r JOIN q USING (source)
        WHERE r.rnk <= q.quota""")),

    // T18: DSIR-style importance weighting (Data Selection via Importance
    // Resampling) — rank out-of-domain documents by how much more likely
    // a TARGET-domain unigram LM finds them than the corpus LM:
    // w(d) = Σ_tok ln(p_target(tok) / p_corpus(tok)), Laplace-smoothed.
    // The target domain is the lexicographically first source
    // (deterministic at every SF); candidates are all other sources.
    // Complements t15: perplexity filters junk, DSIR pulls what LOOKS
    // like the domain you want more of.
    //
    // Exactness: both smoothed probabilities are ratios of integers, so
    // each per-token weight is ONE ln of a product ratio (floor-scaled
    // to micros before the per-doc sum — t14/t15's proven exposure).
    // Each factor casts to DOUBLE BEFORE the multiply: IEEE mult/div
    // are correctly rounded, so the ln input is bit-identical across
    // engines at any corpus size — an Int64 product (ct+1)·(Tc+V) would
    // overflow past Tc ≈ 10¹³ corpus tokens (silent wrap in Spark,
    // error in DuckDB); double factors never do, and below 2^53 the
    // products are exact. Top-50 by the total order
    // (dsir_micro DESC, doc_id ASC).
    //
    // Scale: the token stream materializes once; both LMs are map-side-
    // combinable token counts; the per-token weight table is vocab-sized
    // (broadcastable here; at 100 TB it becomes a plain keyed join — the
    // hashed-feature variant in the paper exists precisely to keep that
    // table small); top-k is TakeOrderedAndProject.
    "t18_dsir_importance" -> QueryDef(
      build = (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("token"))
          .localCheckpoint(true)
        val tgt = broadcast(tok.agg(min(col("source")).as("tgt")))
        // one pass for both LM totals + vocab size
        val totals = broadcast(tok.crossJoin(tgt).agg(
          count(lit(1)).as("Tc"),
          count(when(col("source") === col("tgt"), 1)).as("Tt"),
          countDistinct(col("token")).as("V")))
        val cc = tok.groupBy("token").agg(count(lit(1)).as("cc"))
        val ct = tok.crossJoin(tgt).filter(col("source") === col("tgt"))
          .groupBy("token").agg(count(lit(1)).as("ct"))
        val weights = cc.join(ct, Seq("token"), "left")
          .na.fill(0L, Seq("ct"))
          .crossJoin(totals)
          .withColumn("w_micro",
            floor(log(
              (col("ct") + 1L).cast("double") * (col("Tc") + col("V")).cast("double") /
                ((col("cc") + 1L).cast("double") * (col("Tt") + col("V")).cast("double")))
              * 1000000.0).cast("long"))
          .select("token", "w_micro")
        tok.crossJoin(tgt).filter(col("source") =!= col("tgt"))
          .join(broadcast(weights), "token")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("w_micro")).as("dsir_micro"))
          .orderBy(col("dsir_micro").desc, col("doc_id").asc)
          .limit(50)
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, source, unnest($sqlTokens) AS token FROM documents),
        tgt AS (SELECT min(source) AS tgt FROM tok),
        tot AS (
          SELECT count(*) AS Tc,
                 count(CASE WHEN source = tgt THEN 1 END) AS Tt,
                 count(DISTINCT token) AS V
          FROM tok CROSS JOIN tgt),
        cc AS (SELECT token, count(*) AS cc FROM tok GROUP BY 1),
        ct AS (SELECT token, count(*) AS ct FROM tok CROSS JOIN tgt
               WHERE source = tgt GROUP BY 1),
        w AS (
          SELECT cc.token,
                 CAST(floor(ln(
                   CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) * CAST(Tc + V AS DOUBLE) /
                   (CAST(cc.cc + 1 AS DOUBLE) * CAST(Tt + V AS DOUBLE)))
                   * 1000000.0) AS BIGINT) AS w_micro
          FROM cc LEFT JOIN ct ON cc.token = ct.token CROSS JOIN tot)
        SELECT t.doc_id, count(*) AS n_tokens,
               CAST(sum(w.w_micro) AS BIGINT) AS dsir_micro
        FROM tok t CROSS JOIN tgt JOIN w ON t.token = w.token
        WHERE t.source <> tgt
        GROUP BY t.doc_id
        ORDER BY dsir_micro DESC, doc_id ASC LIMIT 50"""),
      bench = true),

    // T32: DSIR over HASHED features — the form the DSIR paper actually
    // ships at scale: tokens map to a FIXED 2^16-bucket feature space via
    // the shared portable hash, so the weight table is bounded at 65,536
    // rows no matter the corpus (t18's per-token table grows with the
    // vocabulary — fine at bench SF, unbounded at 100 TB web scale).
    // SAME log-ratio arithmetic as t18 in every other respect (add-one
    // smoothing over the observed distinct-feature count, micro-scaled
    // integer weights, integer tie-broken top-50) — on a collision-free
    // vocabulary the two are provably identical (TextOpsSpec's parity
    // gate); under collisions the bucket simply pools its tokens'
    // counts, the standard hashing-trick trade.
    "t32_dsir_hashed" -> QueryDef(
      build = (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("token"))
          .select(col("doc_id"), col("source"),
            pmod(graft.functions.TextFunctions.portableHash(
              col("token"), "dsir:"), lit(DsirBuckets)).as("b"))
          .localCheckpoint(true)
        val tgt = broadcast(tok.agg(min(col("source")).as("tgt")))
        val totals = broadcast(tok.crossJoin(tgt).agg(
          count(lit(1)).as("Tc"),
          count(when(col("source") === col("tgt"), 1)).as("Tt"),
          countDistinct(col("b")).as("V")))
        val cc = tok.groupBy("b").agg(count(lit(1)).as("cc"))
        val ct = tok.crossJoin(tgt).filter(col("source") === col("tgt"))
          .groupBy("b").agg(count(lit(1)).as("ct"))
        val weights = cc.join(ct, Seq("b"), "left")
          .na.fill(0L, Seq("ct"))
          .crossJoin(totals)
          .withColumn("w_micro",
            floor(log(
              (col("ct") + 1L).cast("double") * (col("Tc") + col("V")).cast("double") /
                ((col("cc") + 1L).cast("double") * (col("Tt") + col("V")).cast("double")))
              * 1000000.0).cast("long"))
          .select("b", "w_micro")
        tok.crossJoin(tgt).filter(col("source") =!= col("tgt"))
          .join(broadcast(weights), "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("w_micro")).as("dsir_micro"))
          .orderBy(col("dsir_micro").desc, col("doc_id").asc)
          .limit(50)
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT doc_id, source,
                 (CAST(concat('0x', substr(md5(concat('dsir:', token)),1,15)) AS BIGINT)
                  % $DsirBuckets) AS b
          FROM (SELECT doc_id, source, unnest($sqlTokens) AS token FROM documents)),
        tgt AS (SELECT min(source) AS tgt FROM tok),
        tot AS (
          SELECT count(*) AS Tc,
                 count(CASE WHEN source = tgt THEN 1 END) AS Tt,
                 count(DISTINCT b) AS V
          FROM tok CROSS JOIN tgt),
        cc AS (SELECT b, count(*) AS cc FROM tok GROUP BY 1),
        ct AS (SELECT b, count(*) AS ct FROM tok CROSS JOIN tgt
               WHERE source = tgt GROUP BY 1),
        w AS (
          SELECT cc.b,
                 CAST(floor(ln(
                   CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) * CAST(Tc + V AS DOUBLE) /
                   (CAST(cc.cc + 1 AS DOUBLE) * CAST(Tt + V AS DOUBLE)))
                   * 1000000.0) AS BIGINT) AS w_micro
          FROM cc LEFT JOIN ct ON cc.b = ct.b CROSS JOIN tot)
        SELECT t.doc_id, count(*) AS n_tokens,
               CAST(sum(w.w_micro) AS BIGINT) AS dsir_micro
        FROM tok t CROSS JOIN tgt JOIN w ON t.b = w.b
        WHERE t.source <> tgt
        GROUP BY t.doc_id
        ORDER BY dsir_micro DESC, doc_id ASC LIMIT 50""")),

    // T19: per-document novelty/redundancy profile — what fraction of a
    // document's winnowed regions (d12's local fingerprints) appears
    // NOWHERE else in the corpus. The corpus-curation signal behind
    // redundancy-aware sampling weights: boilerplate-heavy or
    // template-cloned docs score near 0, genuinely novel writing near
    // 1e6; unlike whole-doc dedup it grades PARTIAL redundancy
    // continuously. Floor-scaled ppm (integer-exact in any engine).
    // Docs too short to fill one winnow window have no fingerprints and
    // no profile row (they carry no region evidence either way).
    //
    // Scale: two keyed shuffles of 8-byte fingerprint rows — one on h
    // for the document-frequency count, one on doc_id for the rollup;
    // both aggregations combine map-side. Never text, never pairs.
    "t19_novelty_profile" -> QueryDef(
      build = (s, d) => {
        // the shared winnow index (Dedup.winnowIndex): fp is the same
        // materialized fingerprint frame d12/d13 pair over, df the same
        // document-frequency frame their hot-fingerprint gate reads —
        // one definition across the winnow family
        val idx = graft.queries.Dedup.winnowIndex(s, d)
        val (fp, df) = (idx.fp, idx.df)
        fp.join(df, Seq("h"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fp"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
          .select(col("doc_id"), col("n_fp"), col("n_unique"),
            expr("n_unique * 1000000 div n_fp").as("novelty_ppm"))
      },
      oracle = Some(s"""
        WITH ${graft.queries.Dedup.sqlWinnowCtes},
        df AS (SELECT h, count(*) AS df FROM f GROUP BY 1)
        SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unique,
               CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS novelty_ppm
        FROM f JOIN df ON df.h = f.h
        GROUP BY f.doc_id""")),

    // T20: HYBRID retrieval by example — the fusion step every modern
    // retrieval/curation stack runs on top of its lexical and vector
    // indexes: given a query DOCUMENT (its text and its embedding), rank
    // related corpus documents by Reciprocal Rank Fusion (Cormack et al.
    // SIGIR'09, k=60) of (a) BM25 over the query's 8 rarest tokens and
    // (b) embedding cosine — the query-by-example shape used to audit
    // contamination and investigate near-dup clusters (find everything
    // related to THIS doc, whether it shares words or only meaning).
    //
    // Determinism: both input ranks are total orders (integer-micro BM25
    // desc + doc_id; raw cosine desc + doc_id — bit-identical sequential
    // folds, the e1 contract), and the fused score is integer
    // 1e6 div (60 + rank) per list — engine-exact, fully hash-checked.
    //
    // Scale: the query side is broadcast everywhere — query terms are
    // capped at the 8 rarest (top-idf query reduction, the standard way
    // to bound a lexical probe), so the corpus-side work is one
    // token-keyed join touching only docs sharing a rare term; the
    // semantic side here is e1's broadcast-query brute scan (at corpus
    // scale you swap in e2/e4/e5 and the fusion is unchanged — it only
    // ever sees two ≤50-row ranked lists per query); fusion itself is a
    // full-outer join of bounded lists, ≤100 rows per query at any
    // corpus size.
    "t20_hybrid_rrf" -> QueryDef(
      build = (s, d) => {
        val qIds = rrfQueryIds(s, d)
        val lex = rrfLexLeg(s, d, qIds)
        // ---- semantic list: cosine top-50 (e1's broadcast-query shape;
        // Embeddings.norm is the family's one dot/norm definition)
        // shared normalization (IvfIndex.normalized — zero-norm aborts
        // under ANSI, NaN components drop at the !isnan filter; e8 gates)
        val vn = graft.ops.IvfIndex.normalized(
          Tables.embeddings(s, d).transform(Tables.spread))
        val qv = vn.join(qIds, col("vec_id") === col("q_id"))
          .select(col("q_id"), col("ne").as("q_ne"))
        val sem = vn.crossJoin(broadcast(qv))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("doc_id"),
            call_function("vec_dot", col("q_ne"), col("ne")).as("cos"))
          .filter(col("cos").isNotNull && !isnan(col("cos")))
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(50)(col("cos"), col("doc_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("doc_id"),
            (col("pos") + 1).cast("long").as("sem_rank"))
        rrfFuse(lex, sem)
      },
      oracle = Some(s"""
        WITH $sqlBm25Ctes,
        q AS (SELECT e.vec_id AS q_id FROM embeddings e
              JOIN documents doc ON doc.doc_id = e.vec_id
              WHERE e.vec_id % 100 = 0),
        $sqlRrfLexCtes,
        n AS (SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(x AS DOUBLE) / sqrt(${Embeddings.sqlDotOf("embedding", "embedding")})) AS ne
              FROM embeddings),
        qv AS (SELECT q.q_id, n.ne AS qe FROM q JOIN n ON n.vec_id = q.q_id),
        cosall AS (SELECT qv.q_id, n.vec_id AS doc_id,
                     list_sum(list_transform(range(1, len(qe)+1), i -> qe[i] * n.ne[i])) AS cos
                   FROM qv CROSS JOIN n WHERE n.vec_id <> qv.q_id),
        sem AS (SELECT q_id, doc_id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS sem_rank
                FROM cosall QUALIFY sem_rank <= 50)
        $sqlRrfFusion"""),
      bench = true),

    // T30: hybrid retrieval over an ANN shortlist — t20's fusion with
    // the semantic leg swapped from the exact brute-force scan to e4's
    // IVF 8-probe index (Embeddings.ivfCandidates — ONE index
    // definition, two consumers). This is the composition a production
    // RAG stack actually runs (BM25 leg + ANN shortlist + RRF), and it
    // exercises ANN-output-as-join-input: the shortlist flows into the
    // full-outer fusion join instead of terminating at a top-k.
    //
    // Scale: the lex leg is t20's rare-token bucket join; the semantic
    // leg replaces t20's corpus×queries brute scan — the term that
    // MEASURABLY carried t20's growth (SCALE.md tail 0.54) — with
    // centroid-broadcast probes + one cid-keyed cell join, whose cost
    // follows the 8 probed cells, not the corpus. The recall price of
    // the shortlist vs t20's exact leg is measured and gated in
    // TextOpsSpec (the e4-vs-e1 recall contract applied to fused lists).
    "t30_hybrid_ann_rrf" -> QueryDef(
      build = (s, d) => {
        val qIds = rrfQueryIds(s, d)
        val lex = rrfLexLeg(s, d, qIds)
        // shared normalization (IvfIndex.normalized — e14's persisted
        // frame and this live one must stay bit-identical)
        val vn = graft.ops.IvfIndex.normalized(
          Tables.embeddings(s, d).transform(Tables.spread))
        val qv = vn.join(qIds, col("vec_id") === col("q_id"))
          .select(col("q_id"), col("ne").as("q_ne"))
        val sem = Embeddings.ivfCandidates(vn, qv)
          .groupBy(col("q_id"))
          .agg(graft.functions.BoundedTopK.topK(50)(col("cos"), col("vec_id")).as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("doc_id"),
            (col("pos") + 1).cast("long").as("sem_rank"))
        rrfFuse(lex, sem)
      },
      oracle = Some(s"""
        WITH $sqlBm25Ctes,
        ${Embeddings.sqlIvfScored("""SELECT e.vec_id AS q_id, n.ne AS qe
              FROM embeddings e
              JOIN documents doc ON doc.doc_id = e.vec_id
              JOIN n ON n.vec_id = e.vec_id
              WHERE e.vec_id % 100 = 0""")},
        $sqlRrfLexCtes,
        sem AS (SELECT q_id, doc_id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS sem_rank
                FROM (SELECT q_id, vec_id AS doc_id, cos FROM scored)
                QUALIFY sem_rank <= 50)
        $sqlRrfFusion"""),
      bench = true),

    // T21: LENGTH-BUCKET padding analytics — training batches pad every
    // sequence to the longest member, so corpus curation reports how
    // much compute padding would burn per power-of-two length bucket
    // (the bucketed-batching everyone ships to cap that waste). Buckets
    // are integer-compared boundaries (never floor(log2(n)): ln-ratio
    // floating point can flip a 2^k boundary doc between engines); the
    // waste ratio is floor-scaled ppm off one double division, CASE-
    // guarded identically on both sides for an (impossible-today)
    // all-empty bucket. One row-local projection + one 6-group
    // map-side-combinable agg: scan speed at any corpus size.
    "t21_length_buckets" -> QueryDef(
      build = (s, d) => {
        val nt = nTokens(col("text"))
        val bucket = when(nt < 16, 0L).when(nt < 32, 1L).when(nt < 64, 2L)
          .when(nt < 128, 3L).when(nt < 256, 4L).otherwise(5L)
        Tables.documents(s, d)
          .select(bucket.as("bucket"), nt.as("nt"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"),
            max(col("nt")).as("max_tokens"))
          .withColumn("padded_tokens", col("n_docs") * col("max_tokens"))
          .withColumn("waste_ppm",
            when(col("padded_tokens") === 0, 0L).otherwise(
              floor((col("padded_tokens") - col("total_tokens")).cast("double")
                / col("padded_tokens").cast("double") * 1000000.0)))
      },
      oracle = Some(s"""
        WITH n AS (
          SELECT CASE WHEN len($sqlTokens) < 16 THEN 0
                      WHEN len($sqlTokens) < 32 THEN 1
                      WHEN len($sqlTokens) < 64 THEN 2
                      WHEN len($sqlTokens) < 128 THEN 3
                      WHEN len($sqlTokens) < 256 THEN 4
                      ELSE 5 END AS bucket,
                 len($sqlTokens) AS nt
          FROM documents),
        b AS (
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 count(*) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS total_tokens,
                 CAST(max(nt) AS BIGINT) AS max_tokens
          FROM n GROUP BY 1)
        SELECT bucket, n_docs, total_tokens, max_tokens,
               n_docs * max_tokens AS padded_tokens,
               CASE WHEN n_docs * max_tokens = 0 THEN 0
                    ELSE CAST(floor(CAST(n_docs * max_tokens - total_tokens AS DOUBLE)
                         / CAST(n_docs * max_tokens AS DOUBLE) * 1000000.0) AS BIGINT)
               END AS waste_ppm
        FROM b""")),

    // T22: deterministic training-order shuffle WITHOUT a global sort —
    // the step between curation and tokenization: every epoch reads the
    // corpus in a pseudo-random order, but a total order over 100 TB is
    // a global sort nobody runs. Instead: shard = portable hash of the
    // doc id (mod a FIXED shard count) and position = rank of that hash
    // WITHIN the shard — one per-shard window, zero global exchanges,
    // and the (shard, pos) pairs are a reproducible permutation any
    // reader can materialize shard-by-shard. The shard count is a
    // workload KNOB, not cluster-derived: it must be fixed (16 here) or
    // the permutation — and the oracle — would change with parallelism;
    // a 100 TB run sets it to O(cluster cores) up front and keeps it for
    // the corpus's lifetime, exactly like a bucket count. Hash-ordering
    // is the t17 rank-free philosophy applied to ordering.
    "t22_shuffle_shards" -> QueryDef(
      build = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val h = graft.functions.TextFunctions
          .portableHash(col("doc_id").cast("string"), "shuf:")
        Tables.documents(s, d)
          .select(col("doc_id"), pmod(h, lit(16L)).as("shard"), h.as("h"))
          .withColumn("pos", row_number().over(
            w.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
            .cast("long"))
          .select(col("doc_id"), col("shard"), col("pos"))
      },
      oracle = Some(s"""
        WITH h AS (
          SELECT doc_id,
                 CAST(concat('0x', substr(md5(concat('shuf:',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
          FROM documents)
        SELECT doc_id, h % 16 AS shard,
               CAST(row_number() OVER (PARTITION BY h % 16
                 ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM h""")),

    // T23: tokenizer-coverage audit — per-language out-of-vocabulary rate
    // against a reference vocab fit on the ENGLISH slice: the "tokenizer
    // was fit on en; how badly does it cover everything else" check run
    // before committing a tokenizer to a multilingual corpus (the token
    // sibling of a18's numeric drift). VocabK is a pinned workload knob
    // like t22's shard count — production sets the tokenizer's real vocab
    // size (32k–100k, still broadcastable); 16 here so the synthetic
    // corpus's ~31-token pool yields real OOV mass. Vocab selection is
    // fully deterministic: count desc with token asc tiebreak through a
    // bounded TakeOrdered, never a global sort.
    //
    // Scale: ONE (lang, token) keyed aggregation reduces the scan to
    // |lang|×|vocab| cells map-side; the fit, the broadcast vocab probe,
    // and the per-lang rollup all run on that tiny cell frame — the
    // corpus itself never shuffles (checkpointed once: the cells feed
    // both the vocab fit and the probe, and differing projections of a
    // twice-consumed subtree would otherwise block ReusedExchange).
    "t23_vocab_coverage" -> QueryDef(
      build = (s, d) => {
        val cells = Tables.documents(s, d)
          .select(col("lang"), explode(tokens(col("text"))).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val vocab = cells.filter(col("lang") === "en")
          .orderBy(col("c").desc, col("token")).limit(VocabK)
          .select(col("token"), lit(1).as("in_vocab"))
        cells.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("lang")
          .agg(sum(col("c")).as("n_tokens"),
            sum(when(col("in_vocab").isNull, col("c")).otherwise(0L))
              .as("oov_tokens"))
          .withColumn("oov_ppm", expr("oov_tokens * 1000000 div n_tokens"))
      },
      oracle = Some(s"""
        WITH tok AS (
          SELECT lang, unnest($sqlTokens) AS token FROM documents),
        cells AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2),
        vocab AS (SELECT token FROM cells WHERE lang = 'en'
                  ORDER BY c DESC, token LIMIT $VocabK)
        SELECT lang,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.token IS NULL THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
               CAST(CAST(sum(CASE WHEN v.token IS NULL THEN c ELSE 0 END) * 1000000 AS BIGINT)
                    // CAST(sum(c) AS BIGINT) AS BIGINT) AS oov_ppm
        FROM cells LEFT JOIN vocab v USING (token)
        GROUP BY lang""")),

    // T24: bigram language-model quality score — t15's unigram LM one
    // Markov order up: p(w2|w1) = c(w1 w2) / c(w1 ·), trained on the
    // corpus itself, scoring every document by average bigram NLL in
    // MICRO-NATS (floor-scaled per BIGRAM OCCURRENCE before the integer
    // sum/div, the t15 exactness discipline — ln's 1-ulp exposure is per
    // (bigram, context) count pair, never order-dependent). Scoring the
    // training corpus itself means every scored bigram has c2 ≥ 1, so no
    // smoothing term is needed and the ratio is exact-integer-derived.
    // High avg ⇒ improbable token TRANSITIONS — catches shuffled-word
    // salad that t15 (a bag-of-words model) scores as perfectly fluent.
    // Docs with < 2 tokens have no bigrams and produce no row (t15's
    // zero-token convention).
    //
    // Scale: the exploded bigram stream is checkpointed once (three
    // consumers — transition counts, context counts, scoring probe —
    // with differing projections would block ReusedExchange otherwise).
    // Counts are map-side-combinable keyed aggs; the two count joins are
    // LEFT UNFORCED — the bigram vocab grows ~Heaps-law with the corpus
    // and may exceed broadcast range at 100 TB, where AQE picks a keyed
    // shuffle join over the same ≪-corpus vocab instead; either way the
    // probe is the only corpus-sized shuffle after the counts.
    "t24_bigram_lm_score" -> QueryDef(
      build = (s, d) => bigramNll(s, d),
      oracle = Some(s"""
        WITH $sqlBigramNllCtes
        SELECT doc_id, n_bigrams, nll_sum, avg_nll_micro FROM dsc"""),
      bench = true),

    // T31: CCNet-style perplexity bucketing — split each language's
    // corpus into head/middle/tail terciles of the t24 bigram-LM score
    // (Wenzek et al. 2020: keep head+middle, drop the tail, per
    // language, because perplexity is only comparable within a
    // language). The keep flag IS the curation artifact; buckets stay
    // in the output so mix planners (t6/t17) can reweight rather than
    // hard-drop.
    //
    // Scale: scoring is t24's (measured tail 0.80). The split must NOT
    // be a window over the per-language DOC frame (an ntile(3)
    // partitioned by lang sorts the head language's entire corpus —
    // billions of rows at 100 TB — in ONE task; real corpora are
    // majority one language). Instead the tercile is derived EXACTLY
    // from the score HISTOGRAM: scores are integer micro-nats, so the
    // per-(lang, score) histogram is one map-side-combinable groupBy,
    // the cumulative count runs over the HISTOGRAM-sized frame
    // (distinct scores per language, not docs), the two cutoff scores
    // per language broadcast back, and each doc buckets by row-local
    // comparison. No doc-frame sort anywhere.
    //
    // Determinism / tie contract: bucket = 1 + (3 · |docs with score <
    // s|) div n — the CDF form of ntile. Equal scores bucket
    // IDENTICALLY (the cutoff never splits a tie group; plain ntile
    // would split it by doc_id), and the rule is exact integer
    // arithmetic mirrored verbatim in the oracle. Docs with < 2 tokens
    // have no bigrams and are excluded by construction in BOTH engines
    // (inner join to the scored frame).
    "t31_perplexity_buckets" -> QueryDef(
      build = (s, d) => {
        // scored feeds the histogram AND the final bucket join with
        // different projections — checkpoint once or the whole t24
        // scoring pipeline runs per consumer (the d4/e5 lesson)
        val scored = bigramNll(s, d)
          .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
            "doc_id")
          .select(col("doc_id"), col("lang"), col("avg_nll_micro"))
          .localCheckpoint(true)
        val wLt = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("s"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wLang = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
        val cuts = scored
          .groupBy(col("lang"), col("avg_nll_micro").as("s"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum_lt", coalesce(sum(col("cnt")).over(wLt), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(wLang))
          .withColumn("bucket", expr("1 + (3 * cum_lt) div n"))
          .groupBy(col("lang"))
          .agg(max(when(col("bucket") === 1L, col("s"))).as("c1"),
            max(when(col("bucket") <= 2L, col("s"))).as("c2"))
        scored.join(broadcast(cuts), Seq("lang"))
          .withColumn("bucket",
            when(col("avg_nll_micro") <= col("c1"), 1L)
              .when(col("avg_nll_micro") <= col("c2"), 2L)
              .otherwise(3L))
          .withColumn("keep", col("avg_nll_micro") <= col("c2"))
          .select(col("doc_id"), col("lang"), col("avg_nll_micro"),
            col("bucket"), col("keep"))
      },
      oracle = Some(s"""
        WITH $sqlBigramNllCtes,
        scored AS (
          SELECT d.doc_id, doc.lang, d.avg_nll_micro
          FROM dsc d JOIN documents doc ON doc.doc_id = d.doc_id),
        hist AS (
          SELECT lang, avg_nll_micro AS s, count(*) AS cnt
          FROM scored GROUP BY 1, 2),
        hb AS (
          SELECT lang, s,
            1 + CAST(3 * COALESCE(CAST(SUM(cnt) OVER (PARTITION BY lang
                  ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT), 0) AS BIGINT)
              // CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS bucket
          FROM hist),
        cuts AS (
          SELECT lang,
            max(CASE WHEN bucket = 1 THEN s END) AS c1,
            max(CASE WHEN bucket <= 2 THEN s END) AS c2
          FROM hb GROUP BY lang)
        SELECT doc_id, lang, avg_nll_micro,
          CAST(CASE WHEN avg_nll_micro <= c1 THEN 1
                    WHEN avg_nll_micro <= c2 THEN 2
                    ELSE 3 END AS BIGINT) AS bucket,
          avg_nll_micro <= c2 AS keep
        FROM scored JOIN cuts USING (lang)""")),

    // T25: sketch-based heavy hitters — the 100 TB sibling of t5's exact
    // token top-k, via a mergeable Misra–Gries aggregator
    // (functions/HeavyHitters): at most k=32 counters per map partition
    // cross the shuffle, vs one row per DISTINCT token for the exact
    // groupBy (which is the bottleneck once the key space stops fitting
    // the shuffle — urls, n-grams, user agents). The a12/a16 determinism
    // pattern: the sketch CONTENT is partition-order-dependent, so the
    // output carries exact values plus the sketch's GUARANTEE booleans —
    // capture (every token with freq > N/k survives) and bounded
    // undercount (0 ≤ exact − est ≤ N/k) — which the Misra–Gries
    // mergeable-summaries theorem makes TRUE under any partitioning;
    // the oracle expects literal TRUE, so the guarantee itself is
    // hash-gated. All comparisons in exact integer arithmetic
    // (exact·k vs N), never ratios.
    "t25_heavy_hitters" -> QueryDef(
      build = (s, d) => {
        val tok = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("token"))
          .localCheckpoint(true) // feeds the sketch+total AND the exact counts
        val sk = tok.agg(
          graft.functions.HeavyHitters.sketch(HhK)(col("token")).as("sk"),
          count(lit(1)).as("n_total"))
        heavyHitterAudit(tok, sk)
      },
      oracle = Some(sqlHeavyHitterAudit)),

    // T26: exact duplicated-substring spans — the "deduplicating training
    // data" operator (Lee et al. 2022) at token-8-gram granularity: find
    // every 8-token gram occurring in MORE THAN ONE document, then merge
    // each document's duplicated gram positions into maximal token spans
    // (the text a pipeline would cut before training). Cross-doc only —
    // within-doc repetition is t11's job. Catches UNALIGNED sub-document
    // overlap (shared boilerplate, licenses, quoted passages) that d1
    // (whole-doc) and t12 (fixed-offset chunks) both miss.
    //
    // Scale: gram fingerprints are computed row-local (explode + md5
    // inside one codegen stage — only (doc_id, pos, 16-byte fp) rows ever
    // move, ~28 B per corpus token); the dup-fp set is a map-side-
    // combinable distinct + HAVING ≥2; the position join is fp-keyed and
    // AQE-skew-splittable; the island merge is a per-document window over
    // that document's duplicated positions only — bounded by doc length,
    // never corpus-global. The gram frame feeds two consumers with
    // different projections (dup-fp election and the position join), so
    // it is localCheckpoint'd once — materializing ~28 B/token beats
    // re-running the tokenize+md5 scan twice (the d4/e5 ReusedExchange
    // lesson).
    "t26_dup_span_removal" -> QueryDef(
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 8
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          // without this filter sequence(1, n-7) would DESCEND for short
          // docs (Spark default step is -1 when start > stop)
          .filter(size(col("toks")) >= k)
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(1), size(col("toks")) - (k - 1))).as("i"))
          .select(col("doc_id"), col("i"),
            md5(concat_ws(" ", slice(col("toks"), col("i"), lit(k)))).as("fp"))
          .localCheckpoint(true)
        val dupFp = grams.select("fp", "doc_id").distinct()
          .groupBy("fp").agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= 2).select("fp")
        val w = Window.partitionBy("doc_id").orderBy("i")
        grams.join(dupFp, "fp")
          .select(col("doc_id"), col("i"))
          // islands: grams [p, p+7] and [i, i+7] merge iff i ≤ p + 8
          // (overlapping or exactly adjacent duplicated text)
          .withColumn("brk",
            when(lag(col("i"), 1).over(w).isNull ||
              col("i") > lag(col("i"), 1).over(w) + k, 1).otherwise(0))
          .withColumn("island", sum(col("brk")).over(w))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("i")).as("s"), max(col("i")).as("e"),
            count(lit(1)).as("n_dup_grams"))
          .select(col("doc_id"),
            col("s").cast("long").as("span_start"),
            (col("e") + (k - 1)).cast("long").as("span_end"),
            (col("e") + (k - 1) - col("s") + 1).cast("long").as("span_tokens"),
            col("n_dup_grams"))
      },
      bench = true,
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, $sqlTokens AS toks FROM documents),
        g AS (
          SELECT doc_id, i,
                 md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS fp
          FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
          WHERE len(toks) >= 8),
        dup AS (
          SELECT fp FROM (SELECT DISTINCT fp, doc_id FROM g)
          GROUP BY fp HAVING count(*) >= 2),
        pos AS (
          SELECT g.doc_id, g.i,
                 CASE WHEN lag(g.i) OVER w IS NULL
                        OR g.i > lag(g.i) OVER w + 8 THEN 1 ELSE 0 END AS brk
          FROM g JOIN dup USING (fp)
          WINDOW w AS (PARTITION BY g.doc_id ORDER BY g.i)),
        isl AS (
          SELECT doc_id, i,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
          FROM pos)
        SELECT doc_id,
               CAST(min(i) AS BIGINT) AS span_start,
               CAST(max(i) + 7 AS BIGINT) AS span_end,
               CAST(max(i) + 7 - min(i) + 1 AS BIGINT) AS span_tokens,
               count(*) AS n_dup_grams
        FROM isl GROUP BY doc_id, island""")),

    // T27: interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995;
    // Chen & Goodman 1999 §2.7) — the smoothing t24's raw MLE lacks:
    //   P(w2|w1) = (max(c(w1w2) − D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)
    //   Pcont(w2) = N1+(·w2) / |distinct bigrams|,  D = 0.75
    // so frequent-but-unproductive continuations ("san francisco") score
    // differently from promiscuous ones — the standard pre-neural LM
    // filter for corpus quality ranking. Self-scored on the training
    // corpus (like t24), so every scored bigram has c ≥ 1 and p > 0.
    //
    // Scale: all model statistics (c1/N1+ forward, N1+ backward, B) are
    // map-side-combinable aggregates over the DISTINCT-BIGRAM table, not
    // the instance stream; the per-TYPE nll is computed once on that
    // small table and instances join it by bigram key (hot bigrams are
    // AQE-skew-splittable). The instance frame feeds both the type count
    // and the scoring join — checkpointed once (the d4/e5 lesson). Float
    // determinism: one floor-micro per bigram TYPE (identical IEEE op
    // sequence both engines), integer sums after.
    "t27_kneser_ney_score" -> QueryDef(
      build = (s, d) => {
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), explode(shingles(col("text"), 2)).as("g"))
          .localCheckpoint(true)
        val c2 = bg.groupBy("g").agg(count(lit(1)).as("c2"))
          .withColumn("w1", substring_index(col("g"), " ", 1))
          .withColumn("w2", substring_index(col("g"), " ", -1))
          .localCheckpoint(true) // feeds w1-stats, w2-stats, B, and scoring
        val fwd = c2.groupBy("w1")
          .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
        val bwd = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val bTot = c2.agg(count(lit(1)).cast("double").as("bb"))
        val scored = c2.join(fwd, "w1").join(bwd, "w2")
          .crossJoin(broadcast(bTot))
          .select(col("g"),
            floor(-log(
              (greatest(col("c2").cast("double") - lit(0.75), lit(0.0))
                + lit(0.75) * col("n1f").cast("double")
                  * (col("n1b").cast("double") / col("bb")))
                / col("c1").cast("double")) * 1000000.0)
              .cast("long").as("nll"))
        bg.join(scored, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_sum"))
          .withColumn("avg_nll_micro", expr("nll_sum div n_bigrams"))
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, $sqlTokens AS t FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(t), 1)),
                   i -> t[i] || ' ' || t[i+1])) AS g
          FROM toks),
        c2 AS (SELECT g, count(*) AS c2,
                      split_part(g, ' ', 1) AS w1,
                      split_part(g, ' ', 2) AS w2
               FROM bg GROUP BY 1),
        fwd AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2 GROUP BY 1),
        bwd AS (SELECT w2, count(*) AS n1b FROM c2 GROUP BY 1),
        btot AS (SELECT CAST(count(*) AS DOUBLE) AS bb FROM c2),
        scored AS (
          SELECT g,
                 CAST(floor(-ln(
                   (greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0)
                     + 0.75 * CAST(n1f AS DOUBLE)
                       * (CAST(n1b AS DOUBLE) / bb))
                     / CAST(c1 AS DOUBLE)) * 1000000) AS BIGINT) AS nll
          FROM c2 JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN btot)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(nll) AS BIGINT) AS nll_sum,
               CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro
        FROM bg JOIN scored USING (g) GROUP BY doc_id""")),

    // T28: Zipf rank-frequency audit — per language, OLS slope of
    // ln(freq) on ln(rank) over the top-200 tokens. Natural corpora obey
    // Zipf's law with slope ≈ -1; a corpus whose slope drifts far from
    // it is template-flooded (too steep: a few tokens dominate) or
    // synthetic/shuffled (too flat) — the distribution-level corpus
    // health check that t1's per-document stats can't see.
    //
    // Scale: the token count is map-side combinable; the per-lang
    // top-200 is one lang-keyed window the optimizer runs as
    // WindowGroupLimit (map tasks forward ≤ 200 rows per lang — never a
    // global token sort); the regression is the a20 integer-moment
    // pattern: ln() is the ONLY float, floor-scaled to BIGINT micro-nats
    // per row (the t14/t15 pattern) so the moment sums are exact integer
    // arithmetic — summation-order independent, hash-verifiable — and
    // the one closing division is the only floating step. A
    // single-token language (degenerate 0 denominator: ANSI abort vs
    // DuckDB NaN) is dropped, mirrored (the a20 contract).
    "t28_zipf_audit" -> QueryDef(
      build = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(desc("freq"), asc("token"))
        val ranked = Tables.documents(s, d)
          .select(col("lang"), explode(tokens(col("text"))).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("freq"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 200)
        val m = ranked
          .select(col("lang"),
            floor(log(col("rk").cast("double")) * 1000000.0).cast("long").as("x"),
            floor(log(col("freq").cast("double")) * 1000000.0).cast("long").as("y"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
        m.filter(col("n") >= 2)
          .select(col("lang"), col("n").cast("long").as("n_tokens"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
              4).as("zipf_slope"))
      },
      bench = true,
      oracle = Some(s"""
        WITH tf AS (
          SELECT lang, token, count(*) AS freq
          FROM (SELECT lang, unnest($sqlTokens) AS token FROM documents)
          GROUP BY 1, 2),
        ranked AS (
          SELECT lang, freq,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY freq DESC, token ASC) AS rk
          FROM tf QUALIFY rk <= 200),
        pts AS (
          SELECT lang,
                 CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000) AS BIGINT) AS x,
                 CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
          FROM ranked),
        m AS (
          SELECT lang, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM pts GROUP BY 1)
        SELECT lang, CAST(n AS BIGINT) AS n_tokens,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
        FROM m WHERE n >= 2""")),

    // T29: weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    // 2006) — select 100 documents with inclusion probability skewed
    // toward weight w = n_chars (the token-budget-proportional sampler:
    // longer docs carry more training tokens, so a budget-holding
    // subsample admits them proportionally more often). Unlike t6 (rank
    // BY quality — a deterministic cutoff that never admits the tail)
    // this keeps every document in play with probability ∝ its weight.
    //
    // Determinism: the E-S "random" u is the portable 60-bit hash of the
    // doc_id (no RNG state — reproducible on any cluster and in the
    // oracle); the E-S key u^(1/w) is rank-equivalent to
    // −ln(u)/w ASCENDING, carried as the all-positive integer
    // (floor(−ln(u)·1e6) · 1e6) div w so the ranking is exact integer
    // arithmetic (negative division would diverge: Spark `div` truncates
    // toward zero, DuckDB `//` floors — positives agree). ln() is the
    // only float, micro-floored per row (the t14/t15 pattern).
    //
    // Scale: weights and hashes are row-local; the global top-100 runs
    // as TakeOrderedAndProject (k·partitions rows cross the wire, never
    // a global sort).
    "t29_weighted_sample" -> QueryDef(
      build = (s, d) => {
        val u = (pmod(portableHash(col("doc_id").cast("string"), "ws:"),
          lit(1000000L)) + 1).cast("double") / 1000000.0
        Tables.documents(s, d)
          // weight-0 docs are excluded, mirrored: E-S gives them zero
          // inclusion probability, and the unguarded div would emit a
          // NULL key whose sort position DIVERGES cross-engine (Spark
          // ASC is NULLS FIRST — guaranteeing the weight-0 doc in! —
          // vs DuckDB's NULLS LAST)
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("source"), col("n_chars"),
            floor(-log(u) * 1000000.0).cast("long").as("m"))
          .withColumn("es_key", expr("(m * 1000000) div n_chars"))
          .select(col("doc_id"), col("source"), col("n_chars"), col("es_key"))
          .orderBy(col("es_key").asc, col("doc_id").asc)
          .limit(100)
      },
      oracle = Some("""
        WITH keyed AS (
          SELECT doc_id, source, n_chars,
                 CAST(floor(-ln(CAST(CAST(concat('0x', substr(md5(
                     concat('ws:', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                   % 1000000 + 1 AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT) AS m
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, source, n_chars, (m * 1000000) // n_chars AS es_key
        FROM keyed ORDER BY es_key ASC, doc_id ASC LIMIT 100"""))
  )

  /** DuckDB twin of [[heavyHitterAudit]], shared by t25 and st16. */
  private[queries] def sqlHeavyHitterAudit: String = s"""
        WITH tok AS (SELECT unnest($sqlTokens) AS token FROM documents),
        tot AS (SELECT count(*) AS n FROM tok),
        exact AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY 1
                  ORDER BY exact_cnt DESC, token LIMIT 10)
        SELECT token, exact_cnt,
               exact_cnt * $HhK > n AS heavy,
               TRUE AS captured_ok,
               TRUE AS est_ok
        FROM exact CROSS JOIN tot"""

  /** t23's reference-vocab size — a pinned knob (see the query comment). */
  private val VocabK = 16

  /** Shared Okapi BM25 corpus scaffolding — ONE definition for t16
    * (corpus-driven retrieval) and t20/t30 (hybrid fusion).
    *
    * The hub is `tf`: the (doc_id, token) → occurrence-count table,
    * aggregated ONCE from the token stream and checkpointed — every
    * other corpus statistic derives from it with strictly fewer rows
    * than the raw occurrence stream the previous layout shuffled:
    * dl = Σ tf per doc (value-identical to counting occurrences),
    * dfTab = one count per token (replacing a distinct-pairs shuffle
    * PLUS a token groupBy over the full occurrence stream with one
    * groupBy over the already-distinct tf pairs), and the probe joins
    * match against tf rows instead of raw occurrences, so their
    * post-join per-(q, doc, token) grouping disappears entirely
    * (r15, guide §2.3 "aggregate before you shuffle"). */
  private final case class Bm25Corpus(
      tf: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame,
      totals: org.apache.spark.sql.DataFrame,
      dfTab: org.apache.spark.sql.DataFrame)

  private def bm25Corpus(
      s: org.apache.spark.sql.SparkSession, d: String): Bm25Corpus = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      // key the materialized hub by doc_id (localCheckpoint preserves
      // outputPartitioning): dl's groupBy and every consumer's
      // probe-matches ⋈ dl attach then reuse THIS exchange instead of
      // re-shuffling per consumer (guide §2.4 — two operations keyed the
      // same way share one exchange; the repartition moves the compact
      // post-agg hub once, at build)
      .repartition(col("doc_id"))
      .localCheckpoint(true)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val totals = broadcast(dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).cast("double").as("nd")))
    val dfTab = tf.groupBy("token").agg(count(lit(1)).as("df"))
    Bm25Corpus(tf, dl, totals, dfTab)
  }

  /** The per-(doc, term) Okapi BM25 partial (k1 = 1.2, b = 0.75,
    * +1-smoothed idf), floor-scaled to integer micros BEFORE the
    * per-doc sum so cross-engine ln() ulps cannot flip ranks; expects
    * columns tf, df, dl, nd, avgdl in scope. */
  private def bm25Micro: org.apache.spark.sql.Column =
    floor((log(lit(1.0) + (col("nd") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5)) *
      ((col("tf").cast("double") * 2.2) /
        (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))))
      * 1000000.0).cast("long")

  /** DuckDB twins of [[bm25Corpus]] (CTEs tok/dl/tot/dfx) and
    * [[bm25Micro]] (over a tf row aliased `f` joined to dl alias `l`,
    * with tot cross-joined). */
  private val sqlBm25Ctes = s"""tok AS (
          SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        tot AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
                       CAST(count(*) AS DOUBLE) AS nd FROM dl),
        dfx AS (SELECT token, count(*) AS df
                FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1)"""

  private val sqlBm25Micro = """CAST(floor(
                   (ln(1.0 + ((nd - CAST(f.df AS DOUBLE)) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
                    * ((CAST(f.tf AS DOUBLE) * 2.2) /
                       (CAST(f.tf AS DOUBLE) +
                         1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / avgdl)))))
                   * 1000000.0) AS BIGINT)"""

  /** The t24/t31 bigram-LM scoring pipeline — per-doc
    * (n_bigrams, nll_sum, avg_nll_micro) from the corpus-fit raw bigram
    * model (nll floor-scaled to integer micro-nats BEFORE the per-doc
    * sum, the t15 pattern). ONE definition for the score query and the
    * perplexity-bucket curation built on it. */
  private def bigramNll(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(col("text"), 2)).as("g"))
      .localCheckpoint(true)
    val c2 = bg.groupBy("g").agg(count(lit(1)).as("c2"))
    // context mass c1(w1) = bigrams starting with w1 (Σ_w c(w1, w))
    val c1 = bg.select(substring_index(col("g"), " ", 1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.join(c2, "g")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(c1, "w1")
      .withColumn("nll",
        floor(-log(col("c2").cast("double") / col("c1").cast("double"))
          * 1000000.0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll")).as("nll_sum"))
      .withColumn("avg_nll_micro", expr("nll_sum div n_bigrams"))
  }

  /** DuckDB twin of [[bigramNll]] — CTE chain ending in
    * `dsc(doc_id, n_bigrams, nll_sum, avg_nll_micro)`. */
  private val sqlBigramNllCtes: String = s"""toks AS (
          SELECT doc_id, $sqlTokens AS t FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(t), 1)),
                   i -> t[i] || ' ' || t[i+1])) AS g
          FROM toks),
        c2 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY 1),
        c1 AS (SELECT split_part(g, ' ', 1) AS w1, count(*) AS c1
               FROM bg GROUP BY 1),
        nsc AS (
          SELECT doc_id,
                 CAST(floor(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                   * 1000000) AS BIGINT) AS nll
          FROM bg JOIN c2 USING (g)
          JOIN c1 ON split_part(g, ' ', 1) = w1),
        dsc AS (
          SELECT doc_id, count(*) AS n_bigrams,
                 CAST(sum(nll) AS BIGINT) AS nll_sum,
                 CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro
          FROM nsc GROUP BY doc_id)"""

  /** The t20/t30 query set: docs that have an embedding, id % 100 == 0
    * — broadcast (workload-sized). */
  private def rrfQueryIds(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    broadcast(
      Tables.embeddings(s, d).select(col("vec_id").as("q_id"))
        .filter(col("q_id") % 100 === 0)
        .join(Tables.documents(s, d).select(col("doc_id").as("q_id")),
          Seq("q_id"), "left_semi"))

  /** The t20/t30 lexical leg — BM25 over each query doc's 8 rarest
    * tokens, ranks 1..50 per query (bm25Corpus/bm25Micro are the ONE
    * definition of the tokenized corpus and the scoring kernel, shared
    * with t16). Output: (q_id, doc_id, lex_rank). */
  private def rrfLexLeg(s: org.apache.spark.sql.SparkSession, d: String,
      qIds: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val c = bm25Corpus(s, d)
    // tf rows are one-per-(doc, token), so the query-doc slice is
    // distinct by construction — no distinct shuffle
    val qtok = broadcast(
      c.tf.join(qIds, col("doc_id") === col("q_id"))
        .select(col("q_id"), col("token"))
        .join(c.dfTab, "token")
        .withColumn("trn", row_number().over(
          w.partitionBy(col("q_id")).orderBy(col("df").asc, col("token").asc)))
        .filter(col("trn") <= 8)
        .select("q_id", "token", "df"))
    c.tf.join(qtok, "token")
      .filter(col("doc_id") =!= col("q_id"))
      .join(c.dl, "doc_id").crossJoin(c.totals)
      .withColumn("micro", bm25Micro)
      .groupBy("q_id", "doc_id").agg(sum(col("micro")).as("bm25"))
      .withColumn("lex_rank", row_number().over(
        w.partitionBy(col("q_id")).orderBy(col("bm25").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("lex_rank") <= 50)
      .select("q_id", "doc_id", "lex_rank")
  }

  /** The t20/t30 RRF fusion: integer micro contributions, a missing
    * list contributes 0; top-10 per query with a total tiebreak.
    *
    * The full-outer join of the two ranked lists is merged as
    * union + groupBy instead (r16, guide §2.4/§3.1): a full outer cannot
    * broadcast either side, so the join form always plans as a
    * SortMergeJoin — two (q_id, doc_id)-keyed exchanges plus two sorts,
    * followed by a third exchange for the per-query window. Each side
    * holds at most one row per (q_id, doc_id) (lex is a (q_id, doc_id)
    * groupBy's rank, sem a per-query top-k over unique doc ids), so
    * outer-merging them is exactly max-ignoring-nulls per key over the
    * union. The union is exchange-free, and repartitioning it by q_id
    * alone both satisfies the groupBy's (q_id, doc_id) clustering and
    * leaves the window's q_id partitioning in place — ONE exchange end
    * to end, no sorts before the window's own. */
  private def rrfFuse(lex: org.apache.spark.sql.DataFrame,
      sem: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    lex.select(col("q_id"), col("doc_id"), col("lex_rank"),
        lit(null).cast("long").as("sem_rank"))
      .unionByName(sem.select(col("q_id"), col("doc_id"),
        lit(null).cast("long").as("lex_rank"), col("sem_rank")))
      .repartition(col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(max(col("lex_rank")).as("lex_rank"),
        max(col("sem_rank")).as("sem_rank"))
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + sem_rank)"), lit(0L)))
      .withColumn("rn", row_number().over(
        w.partitionBy(col("q_id")).orderBy(col("rrf_micro").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rn") <= 10)
  }

  /** DuckDB twin of [[rrfLexLeg]] (CTEs qt0/qtok/tf/bm/lex; expects
    * tok/dl/tot/dfx from [[sqlBm25Ctes]] and a `q(q_id, ...)` CTE in
    * scope). */
  private val sqlRrfLexCtes: String = s"""qt0 AS (SELECT q.q_id, t.token, dfx.df,
                  row_number() OVER (PARTITION BY q.q_id
                    ORDER BY dfx.df ASC, t.token ASC) AS trn
                FROM q
                JOIN (SELECT DISTINCT doc_id, token FROM tok) t ON t.doc_id = q.q_id
                JOIN dfx ON dfx.token = t.token),
        qtok AS (SELECT q_id, token, df FROM qt0 WHERE trn <= 8),
        tf AS (SELECT qt.q_id, t.doc_id, qt.token, qt.df, count(*) AS tf
               FROM tok t JOIN qtok qt ON qt.token = t.token
               WHERE t.doc_id <> qt.q_id GROUP BY 1, 2, 3, 4),
        bm AS (SELECT f.q_id, f.doc_id,
                 CAST(sum($sqlBm25Micro) AS BIGINT) AS bm25
               FROM tf f JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN tot
               GROUP BY 1, 2),
        lex AS (SELECT q_id, doc_id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS lex_rank
                FROM bm QUALIFY lex_rank <= 50)"""

  /** DuckDB twin of [[rrfFuse]] (the closing `fused` CTE + final SELECT;
    * expects `lex` and `sem` CTEs in scope). */
  private val sqlRrfFusion: String = """,
        fused AS (SELECT coalesce(l.q_id, s.q_id) AS q_id,
                    coalesce(l.doc_id, s.doc_id) AS doc_id,
                    l.lex_rank, s.sem_rank,
                    coalesce(CAST(1000000 // (60 + l.lex_rank) AS BIGINT), 0) +
                      coalesce(CAST(1000000 // (60 + s.sem_rank) AS BIGINT), 0) AS rrf
                  FROM lex l FULL OUTER JOIN sem s
                    ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
        SELECT q_id, doc_id, lex_rank, sem_rank,
               CAST(rrf AS BIGINT) AS rrf_micro,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rn
        FROM fused QUALIFY rn <= 10"""

  /** t17's broadcast quota table: (source, n, quota) with
    * wm = floor(√n · 1e6), W = Σwm, B = 40% of the doc count, and
    * quota = floor(wm·B/W) — every factor cast to double BEFORE the
    * multiply so the arithmetic is engine-identical at any corpus size
    * (exact below 2^53; an Int64 product would wrap past ~4×10⁹ docs).
    * A handful of rows whatever the corpus size: broadcast. */
  private[graft] def temperatureQuotas(
      doc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val counts = doc.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("wm",
        floor(sqrt(col("n").cast("double")) * 1000000.0).cast("long"))
    val tot = broadcast(counts.agg(
      sum(col("wm")).as("W"), expr("sum(n) * 2 div 5").as("B")))
    broadcast(counts.crossJoin(tot)
      .withColumn("quota",
        floor(col("wm").cast("double") * col("B").cast("double")
          / col("W").cast("double")).cast("long"))
      .select("source", "n", "quota"))
  }

  /** The documented 100 TB relaxation of t17 (its header's "rank-free
    * variant", now real): hash-threshold admission instead of the exact
    * per-source rank. Admit iff pmod(h, n) < quota, where h is the
    * portable 60-bit hash of the content fingerprint — deterministic on
    * any cluster, no RNG state, and ZERO corpus shuffle: the quota table
    * broadcasts and the admission test is row-local, so the corpus runs
    * at scan speed (the exact path pays one source-keyed rank shuffle).
    * Cost: the admitted count per source is binomial around the
    * quota instead of exactly the quota — ±O(√quota) jitter
    * (TextOpsSpec bounds the measured deviation at 4√quota + 3; at
    * sf0.01's 5-source corpus the worst observed deviation is recorded
    * in SCALE.md). Same temperature semantics, same determinism. */
  private[graft] def temperatureMixRankFree(
      doc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    doc.join(temperatureQuotas(doc), "source")
      .filter(pmod(portableHash(fingerprint(col("text")), "t17admit:"),
        col("n")) < col("quota"))
      .select("source", "doc_id")
}
