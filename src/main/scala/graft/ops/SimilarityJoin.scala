package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (the PPJoin family, Xiao et al. WWW'08)
  * — all pairs with Jaccard(A, B) ≥ t, without the quadratic all-pairs or
  * all-tokens join.
  *
  * Threshold t is a rational p/q (exact integer prefix math — float
  * thresholds hit rounding traps like `0.8 * 5 → 4.0000…2`). Three
  * provably lossless prunes before exact verification:
  *  - prefix filter: if J ≥ t, A and B share a token among their first
  *    |A| − ceil(t·|A|) + 1 tokens under ANY fixed global token order;
  *    rarest-first (ascending document frequency) maximizes selectivity;
  *  - length filter: J ≥ t ⟹ q·min(|A|,|B|) ≥ p·max(|A|,|B|);
  *  - positional filter: an overlap upper bound from the matched prefix
  *    positions must reach ceil(t/(1+t)·(|A|+|B|)).
  * Survivors are verified with an in-row array intersect against an
  * id-keyed dimension of the full token sets.
  *
  * Scale shape: one doc_id-keyed window shuffle (rank + size together),
  * one prefix-token join (near-linear for fixed similarity structure —
  * the naive token join is Σ_tok k², quadratic on stopwords), one
  * distinct, two dimension joins. Used by d4/d6 with t = 4/5.
  */
object SimilarityJoin {

  /** @param docs     (blockCol, idCol, tokensCol: array<string>) — pairs
    *                 only form within the same block (pass a constant
    *                 column to disable blocking). Ids must be GLOBALLY
    *                 unique (not merely unique per block); column names
    *                 must avoid the internal `_`-prefixed and
    *                 na/nb/pa/pb/a_id/b_id working names.
    * @param p, q     threshold t = p/q, 0 < p ≤ q
    * @return (blockCol, a_id, b_id, jaccard) with jaccard ≥ p/q exact
    */
  def jaccardSelfJoin(
      docs: DataFrame, blockCol: String, idCol: String, tokensCol: String,
      p: Int, q: Int): DataFrame = {
    require(p > 0 && q >= p, s"threshold $p/$q must be in (0, 1]")
    // set semantics, enforced: Jaccard is defined on SETS, but a caller
    // passing raw token arrays would have duplicate tokens inflate the
    // size/prefix math while array_intersect dedups — silently dropping
    // true pairs at the threshold. array_distinct is a no-op for callers
    // that already dedup (d4's tokenSet) and makes the lossless claim
    // hold for every caller. NULL elements are stripped first
    // (array_compact): the verification stage's array_intersect/size
    // math would count a null as a shared token while the prefix
    // stage's inner explode-join can never match one — the two stages
    // must agree on the token universe or the prune drops pairs its own
    // verifier accepts.
    val setDocs = docs.withColumn(tokensCol,
      array_distinct(array_compact(col(tokensCol))))
    val toks = setDocs.select(
      col(blockCol), col(idCol).as("_id"), explode(col(tokensCol)).as("_tok"))
    // document frequency via groupBy + join, NOT a count window over the
    // token partition: the aggregate combines map-side and its (tiny)
    // result can broadcast, and a skewed join is AQE-splittable — a
    // window would funnel every occurrence of a Zipf stopword into ONE
    // task's sort buffer, the exact straggler this operator exists to
    // avoid. The doc-keyed window below computes rank and size together.
    // prefixLen = n − ceil(p·n/q) + 1;  ceil(p·n/q) = (p·n + q − 1) div q
    val docFreq = toks.groupBy("_tok").agg(count(lit(1)).as("_df"))
    val wDoc = Window.partitionBy(col("_id"))
    // materialize the prefix table once: the self-join consumes it as BOTH
    // sides, and the differing a/b projections block Spark's
    // ReusedExchange, so without this the whole scan→explode→df-join→rank
    // subtree runs twice (measured ~2× the query's scan work at sf0.1; at
    // 100 TB the checkpoint write is far cheaper than recomputing the
    // corpus-wide token pipeline)
    val prefix = toks.join(docFreq, "_tok")
      .withColumn("_pos", row_number().over(wDoc.orderBy(col("_df"), col("_tok"))))
      .withColumn("_n", count(lit(1)).over(wDoc))
      .filter(col("_pos") <= col("_n") - expr(s"(_n * $p + ${q - 1}) div $q") + 1)
      .select(col(blockCol), col("_id"), col("_tok"), col("_n"), col("_pos"))
      .localCheckpoint(true)
    // required overlap α = ceil(p·(na+nb) / (p+q))
    val alpha = s"((na + nb) * $p + ${p + q - 1}) div ${p + q}"
    val candidates = prefix
      .select(col(blockCol), col("_id").as("a_id"), col("_tok"),
        col("_n").as("na"), col("_pos").as("pa"))
      .join(prefix
        .select(col(blockCol), col("_id").as("b_id"), col("_tok"),
          col("_n").as("nb"), col("_pos").as("pb")),
        Seq(blockCol, "_tok"))
      .filter(col("a_id") < col("b_id") &&
        col("nb") * q >= col("na") * p && col("na") * q >= col("nb") * p &&
        lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= expr(alpha))
      .select(blockCol, "a_id", "b_id")
      .distinct()
    // dim joins keyed on (block, id): ids unique per block suffice here,
    // though callers should still prefer globally-unique ids (the a < b
    // candidate ordering compares raw ids)
    val dim = setDocs.select(col(blockCol), col(idCol).as("_did"),
      col(tokensCol).as("_ts"), size(col(tokensCol)).cast("long").as("_dn"))
    candidates
      .join(dim.select(col(blockCol), col("_did").as("a_id"), col("_ts").as("a_ts"),
        col("_dn").as("na")), Seq(blockCol, "a_id"))
      .join(dim.select(col(blockCol), col("_did").as("b_id"), col("_ts").as("b_ts"),
        col("_dn").as("nb")), Seq(blockCol, "b_id"))
      .withColumn("_i", size(array_intersect(col("a_ts"), col("b_ts"))).cast("long"))
      // threshold test in exact integers (J ≥ p/q ⟺ q·|A∩B| ≥ p·|A∪B|)
      // — a float compare could misround exact-equality pairs
      .filter(col("_i") * q >= (col("na") + col("nb") - col("_i")) * p)
      .select(col(blockCol), col("a_id"), col("b_id"),
        (col("_i").cast("double") /
          (col("na") + col("nb") - col("_i")).cast("double")).as("jaccard"))
  }
}
