package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling salted join (SURVEY.md §7.4.7 / the 100 TB design
  * points): when one join key dominates the fact side, a plain shuffle
  * join sends the hot key to a single reducer. Salting splits the hot
  * key's rows across `saltFactor` reducers and replicates the (small)
  * build side once per salt — correctness-preserving, skew-breaking.
  *
  * AQE's skew-join handles sort-merge cases adaptively; explicit salting
  * remains the tool for aggregate-under-join and stateful-streaming
  * shapes AQE can't rewrite.
  */
object SaltedJoin {

  /** Content-derived salt in [0, saltFactor): hashing the full row makes
    * the salt stable under task recompute. A salt from
    * `monotonically_increasing_id()` (or unseeded rand) changes when a
    * stage retries after a fetch failure, and a nondeterministic shuffle
    * key can lose or duplicate rows on partial recompute — the classic
    * nondeterministic-repartition hazard. Fully identical rows share a
    * salt, which skews only when a single (key, payload) combination
    * itself dominates. */
  private[graft] def rowSalt(df: DataFrame, saltFactor: Int) =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(saltFactor.toLong))

  /** Equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * `small` is replicated saltFactor× and broadcast when it fits. */
  def apply(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("_salt", rowSalt(large, saltFactor))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** The standard production refinement: salt ONLY detected-hot keys.
    * A first pass counts per-key frequency on the large side; keys above
    * `hotThreshold` get `saltFactor` salts, every other key keeps salt 0 —
    * so the small side is replicated only for the (few) hot keys instead
    * of saltFactor× wholesale, and cold-key shuffle volume is unchanged.
    *
    * The hot-key set is tiny by construction (keys exceeding a row-count
    * threshold), so both membership joins broadcast. The counting pass is
    * one extra scan of `large` — at 100 TB you'd run it on a sample or
    * reuse AQE's shuffle statistics, but the join shape is identical.
    */
  def hotOnly(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, hotThreshold: Long): DataFrame =
    hotOnly(large, small, Seq(key), saltFactor, hotThreshold)

  /** Multi-column-key form of [[hotOnly]] — the shape the pair-forming
    * dedup pipelines need (d3 buckets on (band_idx, band_hash), d12 on a
    * fingerprint). For a SELF-join pair former (both sides projections of
    * the same bucketed frame), salting bounds PER-TASK pair counts: a
    * bucket of k rows lands k/saltFactor probe rows per (key, salt)
    * reducer instead of all k², while total pair output is unchanged —
    * every (x, y) pair still forms exactly once, at x's salt. */
  def hotOnly(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0)
    hotOnlyPrecomputed(large, small, keys, saltFactor,
      large.groupBy(keys.map(col): _*).count()
        .filter(col("count") > hotThreshold)
        .select(keys.map(col): _*))
  }

  /** [[hotOnly]] with a PRECOMPUTED hot-key frame (columns = `keys`,
    * one row per hot key) — for pipelines that already maintain per-key
    * frequencies (d12's winnow index keeps a df-per-fingerprint frame;
    * at 100 TB you'd feed a sample count or AQE shuffle statistics),
    * saving hotOnly's detection scan over `large`.
    *
    * ADAPTIVE: the hot-key set is collected driver-side first — it is
    * metadata-sized by construction (only keys whose row count exceeds
    * a skew threshold), and the collect is the same aggregate the
    * broadcast would have materialized anyway. When it is EMPTY (the
    * common, unskewed case) the plain equi-join is returned verbatim —
    * no membership joins, no `_salt` in the shuffle key, zero plan
    * overhead — the AQE-style "decide from statistics at the
    * boundary" pattern. When hot keys exist, only then does the salted
    * plan materialize. */
  /** Hard ceiling on the collected hot-key set — a guard against a
    * MISCOMPUTED near-full-cardinality frame, not a skew-profile bound:
    * legitimate hot sets can be large (d12 feeds every salt-band
    * fingerprint here, and template-heavy web corpora carry thousands of
    * families), so the cap sits at 2^20 keys (~100 MB of collected rows
    * at worst — comfortably inside the driver) rather than anywhere
    * near a plausible hot-key count. Crossing it means the caller's
    * threshold admits a meaningful fraction of ALL keys. */
  private[graft] val MaxHotKeys = 1 << 20

  def hotOnlyPrecomputed(large: DataFrame, small: DataFrame,
      keys: Seq[String], saltFactor: Int, hotKeyFrame: DataFrame): DataFrame = {
    require(keys.nonEmpty && saltFactor > 0)
    // distinct: a caller-supplied frame with a duplicated hot key would
    // otherwise fan every matching row out once per duplicate through the
    // two membership joins — silently duplicated join output. The frame
    // is metadata-sized, so the dedup is free. limit(MaxHotKeys + 1):
    // bound the driver collect BEFORE it happens and fail with the
    // contract named, not an OOM.
    val hotRows = hotKeyFrame.select(keys.map(col): _*)
      .distinct().limit(MaxHotKeys + 1).collect()
    require(hotRows.length <= MaxHotKeys,
      s"hot-key frame exceeds $MaxHotKeys distinct keys — not " +
        "metadata-sized. hotOnlyPrecomputed's contract is a frame of " +
        "keys whose row count crosses a skew threshold; a near-full key " +
        "set here means the caller's threshold is miscomputed")
    if (hotRows.isEmpty) return large.join(small, keys)
    val session = large.sparkSession
    val hotKeys = session.createDataFrame(
        java.util.Arrays.asList(hotRows: _*),
        org.apache.spark.sql.types.StructType(
          keys.map(k => org.apache.spark.sql.types.StructField(
            k, large.schema(k).dataType))))
      .withColumn("_hot", lit(true))
    val hotSalt = rowSalt(large, saltFactor)
    val salted = large.join(broadcast(hotKeys), keys, "left")
      .withColumn("_salt", when(col("_hot"), hotSalt).otherwise(lit(0L)))
      .drop("_hot")
    val replicated = small.join(broadcast(hotKeys), keys, "left")
      .withColumn("_salt",
        explode(when(col("_hot"), sequence(lit(0L), lit(saltFactor.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("_hot")
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
