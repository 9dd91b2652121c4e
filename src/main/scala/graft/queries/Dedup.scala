package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators for LLM training pipelines over `documents`
  * (driver north-star): exact hash dedup, MinHash+LSH candidate
  * generation, exact n-gram Jaccard verification, and SimHash near-dup
  * pairs.
  *
  * Scale notes (the whole point of these designs):
  *  - d1 exact dedup is one hash-partition shuffle on the fingerprint —
  *    the only scalable exact dedup; never a global sort.
  *  - d2/d3 MinHash+LSH replaces the O(n²) all-pairs comparison with
  *    band-bucket joins: each doc lands in `bands` buckets, candidate
  *    pairs only form inside a bucket. At 100 TB the bucket join is a
  *    shuffle on (band_idx, band_hash) — skew-safe because a band hash
  *    that collects k docs only produces k²/2 candidates locally, and
  *    genuinely hot buckets can be salted or capped.
  *  - d4 verifies candidates exactly but only same-source pairs (bounded
  *    blocks), never all-pairs.
  *  - d5 SimHash gives a single 64-bit signature per doc; near-dup =
  *    small Hamming distance, joinable on rotated prefixes at scale.
  * MinHash/SimHash signatures use engine-native xxhash64, so d2/d3/d5
  * carry no SQL oracle (rows-only check); their semantics are unit-tested
  * against planted duplicates in DedupSpec, and d4's exact Jaccard is
  * oracle-checked.
  */
object Dedup extends QueryGroup {

  private val sqlTokenSet =
    "list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))"

  def defs: Map[String, QueryDef] = Map(
    // D1: exact dedup — md5 of normalized text, lowest doc_id survives.
    "d1_exact_dedup" -> QueryDef(
      build = (s, d) => {
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("fp"))
      },
      oracle = Some("""
        SELECT min(doc_id) AS doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
        GROUP BY fp""")),

    // D2: MinHash signatures (16 hashes over token 2-gram shingles).
    // Engine-native hashing → rows-only check + DedupSpec unit tests.
    "d2_minhash_signature" -> QueryDef(
      build = (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("doc_id"), minhashSignature(col("sh"), 16).as("sig"))
          .select(col("doc_id") +:
            (0 until 16).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*),
      oracle = None),

    // D3: LSH candidate pairs — 16 minhashes banded 4×4; docs sharing any
    // band bucket become candidates; estimated similarity = matching
    // signature fraction, thresholded.
    "d3_lsh_candidate_pairs" -> QueryDef(
      build = (s, d) => {
        val sigs = Tables.documents(s, d)
          .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("doc_id"), minhashSignature(col("sh"), 16).as("sig"))
        val banded = sigs.select(
          col("doc_id"), col("sig"),
          posexplode(array((0 until 4).map(b =>
            xxhash64(slice(col("sig"), b * 4 + 1, 4), lit(b))): _*))
            .as(Seq("band_idx", "band_hash")))
        val a = banded.select(col("band_idx"), col("band_hash"),
          col("doc_id").as("a_id"), col("sig").as("a_sig"))
        val b = banded.select(col("band_idx"), col("band_hash"),
          col("doc_id").as("b_id"), col("sig").as("b_sig"))
        a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            minhashSimilarity(col("a_sig"), col("b_sig")).as("est_sim"))
          .distinct()
          .filter(col("est_sim") >= 0.5)
      },
      oracle = None),

    // D4: exact n-gram Jaccard verification over bounded blocks (same
    // source), floor-scaled — the oracle-checked ground truth for d2/d3.
    // Formulated as explode + token-keyed join + count (all codegen'd)
    // instead of per-pair array intersections: |A∩B| comes from the join,
    // |A∪B| = |A|+|B|−|A∩B|. Pairs sharing zero tokens never materialize
    // — at 100 TB this is the only shape that scales (and it's ~4× faster
    // here than interpreted array_intersect per pair).
    "d4_jaccard_pairs" -> QueryDef(
      build = (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
        val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val shared = toks.select(col("source"), col("doc_id").as("a_id"), col("tok"))
          .join(toks.select(col("source"), col("doc_id").as("b_id"), col("tok")),
            Seq("source", "tok"))
          .filter(col("a_id") < col("b_id"))
          .groupBy("source", "a_id", "b_id").agg(count(lit(1)).as("shared"))
        shared
          .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
          .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
          .select(col("source"), col("a_id"), col("b_id"),
            (floor(col("shared").cast("double") /
              (col("na") + col("nb") - col("shared")).cast("double") * 10000) / 10000.0)
              .as("jaccard"))
          .filter(col("jaccard") >= 0.8)
      },
      oracle = Some(s"""
        WITH toks AS (SELECT doc_id, source, $sqlTokenSet AS t FROM documents)
        SELECT a.source AS source, a.doc_id AS a_id, b.doc_id AS b_id,
               floor(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.t, b.t))) * 10000) / 10000.0 AS jaccard
        FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE floor(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.t, b.t))) * 10000) / 10000.0 >= 0.8"""),
      bench = true),

    // D5: SimHash near-dup pairs — 64-bit signature, Hamming ≤ 6 within
    // same-source blocks. Engine-native hashing → rows-only + DedupSpec.
    "d5_simhash_pairs" -> QueryDef(
      build = (s, d) => {
        val doc = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("source"), simhash64("toks").as("sh"))
        val a = doc.select(col("source"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
        val b = doc.select(col("source"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
        a.join(b, "source")
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), hamming64(col("a_sh"), col("b_sh")).as("hamming"))
          .filter(col("hamming") <= 6)
      },
      oracle = None)
  )
}
