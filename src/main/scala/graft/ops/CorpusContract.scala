package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight validation of an embedding corpus against the contract the
  * similarity-search family (e1/e2/e4/e5/e7, d8) relies on: fixed
  * dimensionality, no null vectors/elements, no NaN/Inf components, no
  * zero-norm vectors.
  *
  * Why a separate pass: the ranking pipelines deliberately normalize with a
  * PLAIN division (no nullif/CaseWhen guard — a guard disables codegen
  * subexpression elimination and measured 4x on e5). Under Spark 4 ANSI a
  * zero-norm vector then aborts with DIVIDE_BY_ZERO (double 0/0 raises
  * too — pinned in EmbeddingsSpec), which is loud but lands mid-job with
  * no indication of how much of the corpus is bad; a NaN/Inf COMPONENT is
  * worse — x/NaN propagates silently and a NaN cosine out-ranks every
  * real score under Double.compare (the queries carry !isnan ranking
  * filters as the in-job line of defense). At 100 TB the right failure
  * mode is THIS one-scan validator run before the ten-hour job: every
  * violation class counted, in seconds, up front.
  *
  * One pass, all-aggregate (map-side combinable, no shuffle beyond the
  * single-row final combine), so it costs one corpus scan at any scale.
  * Reference analogue: the reference's quality gates validate inputs
  * before pipeline stages (src/utils/data_quality_checks.py) — this is
  * that pattern applied to the vector corpus.
  */
object CorpusContract {

  /** One-row violation summary for `df`'s `vecCol` (array<float/double>)
    * against dimension `dim`. Columns: n_vecs, n_null_vec, n_null_elem,
    * n_bad_dim, n_nonfinite, n_zero_norm (all BIGINT), is_valid (bool).
    */
  def validate(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val e = col(vecCol)
    // interpreted higher-order lambdas are fine here: this is a one-shot
    // validation scan, not a per-query hot path
    val hasNullElem = exists(e, x => x.isNull)
    val hasNonFinite = exists(e, x => isnan(x) || abs(x.cast("double")) === lit(Double.PositiveInfinity))
    val wellFormed = e.isNotNull && size(e) === dim && !hasNullElem && !hasNonFinite
    val sumSq: Column = call_function("vec_dot", e.cast("array<double>"), e.cast("array<double>"))
    df.agg(
        count(lit(1)).as("n_vecs"),
        count(when(e.isNull, 1)).as("n_null_vec"),
        count(when(e.isNotNull && hasNullElem, 1)).as("n_null_elem"),
        count(when(e.isNotNull && size(e) =!= dim, 1)).as("n_bad_dim"),
        count(when(e.isNotNull && hasNonFinite, 1)).as("n_nonfinite"),
        count(when(wellFormed && sumSq === 0.0, 1)).as("n_zero_norm"))
      .withColumn("is_valid",
        col("n_null_vec") + col("n_null_elem") + col("n_bad_dim") +
          col("n_nonfinite") + col("n_zero_norm") === 0L)
  }

  /** Runs [[validate]] and throws `IllegalStateException` naming every
    * violation class with its count — the pre-flight gate a pipeline calls
    * before launching the embedding family on a fresh corpus. */
  def assertValid(df: DataFrame, vecCol: String, dim: Int): Unit = {
    val r = validate(df, vecCol, dim).collect()(0)
    if (!r.getBoolean(6)) {
      val names = Seq("null vectors", "null elements", "wrong-dim (!= " + dim + ")",
        "NaN/Inf components", "zero-norm vectors")
      val counts = (1 to 5).map(r.getLong)
      val bad = names.zip(counts).collect { case (n, c) if c > 0 => s"$c $n" }
      throw new IllegalStateException(
        s"embedding corpus violates the similarity-search contract " +
          s"(of ${r.getLong(0)} vectors): ${bad.mkString(", ")}")
    }
  }
}
